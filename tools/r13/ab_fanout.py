"""Interleaved A/B of the small-scan fan-out for one or more queries
(round-13 verdict #1): variant A builds the query as committed, variant B
builds it with FANOUT_MAX_BYTES=0 (fan-out disabled in-session). Both
variants alternate inside the same seconds so the ratio is window-proof.

    python tools/r13/ab_fanout.py llm_dedup_minhash_lsh_md5 [rounds]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.isdigit()]
    rounds = int(next((a for a in sys.argv[1:] if a.isdigit()), "4"))

    import data_pipeline_with_spark_kafka_spark.sources.tables as tables
    from data_pipeline_with_spark_kafka_spark.queries import all_queries
    from data_pipeline_with_spark_kafka_spark.session import get_spark
    from tools.ab_bench import ab

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab-fanout")
    qs = all_queries()
    saved = tables.FANOUT_MAX_BYTES

    for name in names:
        def build_fanned(name=name):
            tables.FANOUT_MAX_BYTES = saved
            return qs[name].builder(spark, sf_dir)

        def build_plain(name=name):
            tables.FANOUT_MAX_BYTES = 0
            return qs[name].builder(spark, sf_dir)

        print(f"== {name} (load {os.getloadavg()[0]:.2f}) ==", flush=True)
        ab(spark, {"fanned": build_fanned, "plain": build_plain}, rounds=rounds)
        tables.FANOUT_MAX_BYTES = saved
    spark.stop()


if __name__ == "__main__":
    main()
