"""Candidate-file ingest (SURVEY.md §2A A3/A4): PHCX-like round-trip
and the injection-gated PFD path."""

import numpy as np
import pytest

from pulsarfeatureextractor_spark.sources.candidates import (
    parse_pfd,
    read_phcx_dir,
    write_synthetic_phcx,
)


def test_phcx_roundtrip_exact(spark, tmp_path):
    """Reader reproduces the writer's bin values EXACTLY (the A5 token
    invariant applied at the ingest boundary), two kinds per candidate."""
    d = str(tmp_path / "phcx")
    truth = write_synthetic_phcx(d, n_files=5, candidates_per_file=3)
    out = read_phcx_dir(spark, d).collect()
    got = {(r["doc_id"], r["kind"]): (list(r["tokens"]), r["n_tok"], r["source"])
           for r in out}
    assert len(got) == 2 * len(truth)
    for doc_id, prof, dm in truth:
        assert got[(doc_id, "profile")] == (prof, len(prof), "phcx")
        assert got[(doc_id, "dmcurve")] == (dm, len(dm), "phcx")


def test_phcx_feeds_feature_pipeline(spark, tmp_path):
    """Ingest output is the hinted shape: Lyon moments run on it
    directly and match the numpy oracle."""
    from pulsarfeatureextractor_spark.functions.moments import with_lyon_features
    from tests.oracle import lyon_moments_oracle

    d = str(tmp_path / "phcx2")
    truth = write_synthetic_phcx(d, n_files=2, candidates_per_file=2)
    seqs = read_phcx_dir(spark, d).where("kind = 'profile'")
    rows = with_lyon_features(seqs).select("doc_id", "mean", "stdev").collect()
    want = {doc_id: lyon_moments_oracle(np.asarray(prof, dtype=np.float64))
            for doc_id, prof, _ in truth}
    assert len(rows) == len(truth)
    for r in rows:
        m, s, _, _ = want[r["doc_id"]]
        assert np.isclose(r["mean"], m) and np.isclose(r["stdev"], s)


def test_phcx_malformed_fails_loudly(spark, tmp_path):
    import gzip
    import os

    d = str(tmp_path / "bad")
    os.makedirs(d)
    xml = ("<phcx><section name='FFT'><candidate id='c0'>"
           "<profile nbins='4' format='02X'>A1B2</profile>"  # 2 vals, claims 4
           "</candidate></section></phcx>")
    with open(os.path.join(d, "x.phcx.gz"), "wb") as f:
        f.write(gzip.compress(xml.encode()))
    with pytest.raises(Exception, match="hex chars"):
        read_phcx_dir(spark, d).collect()


def test_pfd_injection_gate(spark, tmp_path):
    import os

    d = str(tmp_path / "pfd")
    os.makedirs(d)
    with open(os.path.join(d, "a.pfd"), "wb") as f:
        f.write(b"\x01\x02\x03\x04")
    files = spark.read.format("binaryFile").load(d)
    with pytest.raises(NotImplementedError, match="injected parser"):
        parse_pfd(files)

    def fake_parser(blob: bytes) -> dict:
        return {"id": "c0", "profile": list(blob), "dmcurve": [9, 8, 7]}

    rows = {(r["doc_id"], r["kind"]): list(r["tokens"])
            for r in parse_pfd(files, parser=fake_parser).collect()}
    assert rows[("a.pfd#c0", "profile")] == [1, 2, 3, 4]
    assert rows[("a.pfd#c0", "dmcurve")] == [9, 8, 7]


def test_cube_injection_gate(spark, tmp_path):
    from pulsarfeatureextractor_spark.sources.candidates import read_phcx_cubes

    with pytest.raises(NotImplementedError, match="injected extractor"):
        read_phcx_cubes(spark, str(tmp_path))


def test_injected_cube_feeds_subband_kernel(spark, tmp_path):
    """VERDICT r03 #5: the 2-D score kernel is data-source-agnostic —
    an INJECTED real-format cube lands in the same flat column and
    produces scores bit-identical to the numpy kernel run directly on
    the same cubes (no synthetic-cube assumption anywhere)."""
    import gzip as _gzip
    import os
    import xml.etree.ElementTree as ET

    import numpy as np

    from pulsarfeatureextractor_spark.functions.scores import (
        SUBBAND_FIELDS,
        subband_scores_cube,
        with_subband_scores,
    )
    from pulsarfeatureextractor_spark.sources.candidates import read_phcx_cubes

    d = str(tmp_path / "phcx_cubes")
    write_synthetic_phcx(d, n_files=3, candidates_per_file=2)

    n_chan = 4

    def fake_extractor(fname: str, blob: bytes):
        # stands in for a real sub-band block decoder: derives a
        # (n_chan, n_bins) cube from each candidate's profile hex —
        # the derivation rule is irrelevant to the test; what matters
        # is the cube reaches the kernel byte-for-byte
        root = ET.fromstring(_gzip.decompress(blob).decode())
        out = []
        for cand in root.iter("candidate"):
            el = cand.find("profile")
            hx = (el.text or "").strip()
            prof = np.array(
                [int(hx[i:i + 2], 16) for i in range(0, len(hx), 2)]
            )
            cube = np.stack([(prof + 7 * b) % 256 for b in range(n_chan)])
            out.append((cand.attrib["id"], cube))
        return out

    cubes_df = read_phcx_cubes(spark, d, extractor=fake_extractor)
    got = {
        r["doc_id"]: [r[f] for f in SUBBAND_FIELDS]
        for r in with_subband_scores(
            cubes_df, "sb_flat", n_chan=n_chan
        ).collect()
    }
    assert len(got) == 6

    # independent truth: run the numpy kernel on extractor output
    for fname in sorted(os.listdir(d)):
        with open(os.path.join(d, fname), "rb") as fh:
            blob = fh.read()
        for cid, cube in fake_extractor(fname, blob):
            want = subband_scores_cube(cube[None, :, :].astype(np.float64))[0]
            have = np.array(got[f"{fname}#{cid}"])
            assert np.array_equal(have, want), (fname, cid)
