"""Generate the committed media-directory fixture for the binaryFile
ingest-audit query (`media_ingest_audit`).

Writes fixtures/media/ — a deterministic mixed-media directory (uncompressed
BMP images, PCM-16 WAV clips, text notes, an opaque .bin blob; one BMP
deliberately larger than the query's 2048-byte skip limit) — plus
fixtures/media_listing.parquet, the metadata snapshot (file_name, ext,
length) the DuckDB oracle reads. tests/test_sources.py asserts the snapshot
matches a fresh binaryFile listing of the directory, so the two can never
drift silently.

Deterministic: content is derived from fixed seeds/values only. Run:
    python tools/gen_media_fixture.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_with_spark_kafka_spark.operators.multimodal import (  # noqa: E402
    encode_bmp,
    encode_wav_pcm16,
)

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")
MEDIA_DIR = os.path.join(FIXTURES, "media")
LISTING = os.path.join(FIXTURES, "media_listing.parquet")


def main() -> None:
    os.makedirs(MEDIA_DIR, exist_ok=True)
    rng = np.random.default_rng(8)
    files: dict[str, bytes] = {}
    # BMPs: 4x4 / 8x8 / 16x16 fit the 2048-byte limit; 32x32 (3126 B)
    # exceeds it so the status-level size skip has something to skip.
    for i, side in enumerate((4, 8, 16, 32)):
        arr = rng.integers(0, 256, size=(side, side, 3), dtype=np.uint8)
        files[f"img_{i:02d}.bmp"] = encode_bmp(arr)
    for i, n in enumerate((128, 256, 512)):
        t = np.arange(n)
        samples = (3000 * np.sin(2 * np.pi * (220 + 110 * i) * t / 8000)).astype(np.int16)
        files[f"clip_{i:02d}.wav"] = encode_wav_pcm16(samples, sample_rate=8000)
    files["notes_00.txt"] = b"caption: a deterministic fixture image\n"
    files["notes_01.txt"] = b"caption: a second note, slightly longer than the first\n"
    files["blob_00.bin"] = bytes(rng.integers(0, 256, size=777, dtype=np.uint8))

    for name, data in sorted(files.items()):
        with open(os.path.join(MEDIA_DIR, name), "wb") as f:
            f.write(data)

    listing = pd.DataFrame(
        {
            "file_name": sorted(files),
            "ext": [n.rsplit(".", 1)[1] for n in sorted(files)],
            "length": pd.array([len(files[n]) for n in sorted(files)], dtype="int64"),
        }
    )
    listing.to_parquet(LISTING, index=False)
    print(f"wrote {len(files)} files to {MEDIA_DIR} and snapshot {LISTING}")
    print(listing.groupby("ext")["length"].agg(["count", "sum", "max"]))


if __name__ == "__main__":
    main()
