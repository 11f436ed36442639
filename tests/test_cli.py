"""CLI surface (python -m manga_ocr_ray): extract → resume → verify → merge
driven in-process against the shared Ray session."""

import json

import pyarrow.parquet as pq

from manga_ocr_ray.__main__ import main
from manga_ocr_ray.corpus import make_tables


def test_cli_extract_verify_merge(ray_session, tmp_path, capsys):
    t, e = make_tables(30, seed=21)
    tr = str(tmp_path / "tr.parquet")
    exp = str(tmp_path / "exp.parquet")
    out = str(tmp_path / "out")
    pq.write_table(t, tr)
    pq.write_table(e, exp)

    assert main(["extract", "--input", tr, "--out", out, "--num-buckets", "8"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["new_rows"] == t.num_rows

    # resume: nothing to do
    assert main(["extract", "--input", tr, "--out", out, "--num-buckets", "8"]) == 0
    res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res2["new_rows"] == 0 and res2["skipped_buckets"] > 0

    # golden verification drives the exit code
    assert main(["verify", "--out", out, "--expected", exp]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == {"mismatches": 0}

    assert main(["merge", "--out", out, "--dest", str(tmp_path / "merged")]) == 0
    res3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res3["conversations"] == 30

    # the CLI must not have torn down the shared session
    import ray

    assert ray.is_initialized()
