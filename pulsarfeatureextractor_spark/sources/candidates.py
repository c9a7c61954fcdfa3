"""Candidate-file ingest: raw survey candidate files -> the hinted
token-sequence table (SURVEY.md §2A A3/A4).

The reference family consumes per-candidate files (PHCX: gzipped XML
with hex-encoded curves; PFD: PRESTO's binary dump).  `/root/reference`
is mounted empty (SURVEY.md §0), so this module implements a
PHCX-LIKE dialect reconstructed from public descriptions of the
format family (gzipped XML, <profile>/<dmcurve> elements carrying
hex-encoded fixed-width integer bins) — the synthetic writer and the
reader define the dialect together and are round-trip-tested; a real
survey's exact schema would only change element names here.  PFD stays
injection-gated like the media codecs (`parse_pfd` accepts a parser
callable and errors loudly without one) — its binary layout is not
reconstructable from public prose with bit-exact confidence.

Scale shape: `spark.read.format("binaryFile")` distributes whole-file
reads across executors (one row per file, content as bytes — Spark's
standard pattern for many-small-binary-file ingest); parsing is one
`mapInPandas` pass (gzip + stdlib XML per file, no external libs), and
the output is EXACTLY the hinted shape plus the `kind` discriminator
the two-curve Lyon-8 composition uses (profile row + dmcurve row per
candidate).  At 10^12 candidates the same job runs with a larger file
source behind it; nothing here is driver-side.
"""

from __future__ import annotations

import gzip
import os
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CANDIDATE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),    # profile | dmcurve
    T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
    T.StructField("n_tok", T.IntegerType(), False),
    T.StructField("source", T.StringType(), False),
])


def synthetic_phcx_truth(
    n_files: int = 8, candidates_per_file: int = 4,
    n_bins: int = 64, n_dm: int = 32, seed: int = 7,
) -> "list[tuple[str, list[int], list[int]]]":
    """Pure-python ground truth [(doc_id, profile_bins, dm_bins), ...]
    for the synthetic fixture set — an LCG stream chopped into bins.
    Shared by the writer AND the differential oracle, so the expected
    values never depend on running Spark (or touching disk)."""
    truth = []
    state = seed
    for f in range(n_files):
        for c in range(candidates_per_file):
            cid = f"cand_{f:03d}_{c:02d}"
            prof, dm = [], []
            for _ in range(n_bins):
                state = (state * 1103515245 + 12345) % (1 << 31)
                prof.append(state % 256)
            for _ in range(n_dm):
                state = (state * 1103515245 + 12345) % (1 << 31)
                dm.append(state % 256)
            truth.append((f"phcx_{f:03d}.phcx.gz#{cid}", prof, dm))
    return truth


def write_synthetic_phcx(
    out_dir: str, n_files: int = 8, candidates_per_file: int = 4,
    n_bins: int = 64, n_dm: int = 32, seed: int = 7,
) -> "list[tuple[str, list[int], list[int]]]":
    """Write deterministic PHCX-like fixture files; return the ground
    truth [(doc_id, profile_bins, dm_bins), ...] the reader must
    reproduce exactly.  Bin values are seeded pure-python ints in
    [0, 255], hex-encoded 02X as the dialect prescribes."""
    os.makedirs(out_dir, exist_ok=True)
    truth = synthetic_phcx_truth(n_files, candidates_per_file, n_bins, n_dm, seed)
    by_file: dict = {}
    for doc_id, prof, dm in truth:
        fname, cid = doc_id.split("#")
        by_file.setdefault(fname, []).append((cid, prof, dm))
    for fname, cands in by_file.items():
        parts = ["<phcx version='1.0'><section name='FFT'>"]
        for cid, prof, dm in cands:
            parts.append(
                f"<candidate id='{cid}'>"
                f"<profile nbins='{len(prof)}' format='02X'>"
                + "".join(f"{v:02X}" for v in prof)
                + "</profile>"
                f"<dmcurve nvals='{len(dm)}' format='02X'>"
                + "".join(f"{v:02X}" for v in dm)
                + "</dmcurve></candidate>"
            )
        parts.append("</section></phcx>")
        with open(os.path.join(out_dir, fname), "wb") as fh:
            fh.write(gzip.compress("".join(parts).encode()))
    return truth


def _parse_phcx_bytes(fname: str, blob: bytes) -> "list[tuple]":
    """One file's candidates -> rows (pure stdlib; raises on malformed
    hex/length so a corrupt file fails loudly, never silently)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(gzip.decompress(blob).decode())
    rows = []
    for cand in root.iter("candidate"):
        cid = cand.attrib["id"]
        for tag, nattr in (("profile", "nbins"), ("dmcurve", "nvals")):
            el = cand.find(tag)
            if el is None:
                continue
            n = int(el.attrib[nattr])
            hx = (el.text or "").strip()
            if len(hx) != 2 * n:
                raise ValueError(
                    f"{fname}#{cid}/{tag}: {len(hx)} hex chars != 2*{n}")
            vals = [int(hx[i:i + 2], 16) for i in range(0, len(hx), 2)]
            rows.append((f"{fname}#{cid}", tag, vals, n, "phcx"))
    return rows


def read_phcx_dir(spark: SparkSession, path: str) -> DataFrame:
    """Distributed PHCX ingest: binaryFile scan -> mapInPandas parse.

    Output: the hinted sequence shape + ``kind`` ('profile'|'dmcurve'),
    two rows per candidate — ready for ``lyon8`` two-curve composition
    or any 1-D feature family directly.
    """
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.phcx.gz")
    ).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_phcx_bytes(os.path.basename(p), bytes(blob)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "tokens", "n_tok", "source"]
            )

    return files.mapInPandas(parse, CANDIDATE_SCHEMA)


def parse_pfd(
    df: DataFrame,
    parser: "Callable[[bytes], dict] | None" = None,
) -> DataFrame:
    """PFD ingest — INJECTION-GATED like the media codecs: PRESTO's
    .pfd binary layout is not reconstructable from public prose with
    bit-exact confidence, so a real deployment injects a parser
    (bytes -> {'id':…, 'profile': [ints], 'dmcurve': [ints]}); calling
    without one is an explicit error, never a silent fake.  The Spark
    plumbing (binaryFile rows in, CANDIDATE_SCHEMA out) is identical to
    the PHCX path and is tested with an injected fake parser.
    """
    if parser is None:
        raise NotImplementedError(
            "PFD parsing requires an injected parser=... "
            "(binary layout not publicly pinned; see module docstring)"
        )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                d = parser(bytes(blob))
                base = f"{os.path.basename(p)}#{d['id']}"
                for kind in ("profile", "dmcurve"):
                    if d.get(kind):
                        vals = [int(v) for v in d[kind]]
                        rows.append((base, kind, vals, len(vals), "pfd"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "kind", "tokens", "n_tok", "source"]
            )

    return df.select("path", "content").mapInPandas(parse, CANDIDATE_SCHEMA)


CUBE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("sb_flat", T.ArrayType(T.IntegerType()), False),
    T.StructField("n_chan", T.IntegerType(), False),
    T.StructField("source", T.StringType(), False),
])


def read_phcx_cubes(
    spark: SparkSession,
    path: str,
    extractor: "Callable[[str, bytes], list] | None" = None,
) -> DataFrame:
    """2-D cube ingest from candidate files — INJECTION-GATED
    (VERDICT r03 #5): a real .phcx carries sub-band / sub-integration
    (channel x phase) blocks the 2-D score family could consume, but
    their exact element names, bit width, and scaling are not publicly
    pinnable while /root/reference is empty — so the cube decode is
    injected (same gate shape as ``parse_pfd`` and the media codecs),
    and the Spark plumbing around it is real and tested.

    ``extractor``: ``(filename, raw_bytes) -> [(cand_id, cube), ...]``
    where ``cube`` is any (n_chan, n_bins) integer array-like.  Rows
    come back in the flat band-major layout
    (``sb_flat`` = n_chan * n_bins ints) that
    ``functions.scores.with_subband_scores`` consumes DIRECTLY — the
    kernel is data-source-agnostic: a synthetic cube
    (sources/tokenized.with_synthetic_subbands), an injected real
    PHCX cube, and a future PFD cube all land in the same column and
    hit the same mapInArrow kernel (proved in
    tests/test_candidates.py::test_injected_cube_feeds_subband_kernel).

    Scale shape: identical to ``read_phcx_dir`` — distributed
    binaryFile scan, one mapInPandas pass, no driver-side work.
    """
    if extractor is None:
        raise NotImplementedError(
            "PHCX cube decode requires an injected extractor=... "
            "(sub-band block layout not publicly pinned; see docstring)"
        )
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.phcx.gz")
    ).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                fname = os.path.basename(p)
                for cand_id, cube in extractor(fname, bytes(blob)):
                    arr = np.asarray(cube)
                    if arr.ndim != 2:
                        raise ValueError(
                            f"{fname}#{cand_id}: cube must be 2-D "
                            f"(n_chan, n_bins), got shape {arr.shape}"
                        )
                    rows.append((
                        f"{fname}#{cand_id}",
                        [int(v) for v in arr.reshape(-1)],
                        int(arr.shape[0]),
                        "phcx",
                    ))
            yield pd.DataFrame(
                rows, columns=["doc_id", "sb_flat", "n_chan", "source"]
            )

    return files.mapInPandas(parse, CUBE_SCHEMA)
