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


def test_cli_run_yaml_spec(ray_session, tmp_path, capsys, monkeypatch):
    """Typed spec loader: YAML → validated steps → run (VERDICT r1 item 7)."""
    import pyarrow as pa
    import pytest

    from manga_ocr_ray.spec import load_spec

    docs = pa.table({"doc_id": [1, 2, 3],
                     "text": ["<p>Hello  world</p>", "ｶﾞｷﾞ  ﾃｽﾄ", "plain"]})
    src = str(tmp_path / "docs.parquet")
    pq.write_table(docs, src)
    out = str(tmp_path / "clean")
    monkeypatch.setenv("DOCS_PATH", src)
    spec_path = tmp_path / "pipe.yaml"
    spec_path.write_text(f"""
input:
  path: ${{DOCS_PATH}}
  columns: [doc_id, text]
steps:
  - op: strip_html
    out_col: stripped_text
  - op: normalize
    in_col: stripped_text
    out_col: clean_text
  - op: select
    columns: [doc_id, clean_text]
output:
  path: {out}
""")
    assert main(["run", "--spec", str(spec_path)]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["path"] == out
    got = pq.read_table(out).to_pandas().sort_values("doc_id")
    assert list(got.columns) == ["doc_id", "clean_text"]
    # normalize fullwidth-folds ascii (jaconv.h2z(ascii=True) semantics) and
    # squashes whitespace
    assert got["clean_text"].tolist()[0] == "Ｈｅｌｌｏｗｏｒｌｄ"

    # validation happens at LOAD time, with precise errors
    bad_op = tmp_path / "bad_op.yaml"
    bad_op.write_text("input: {path: x}\nsteps: [{op: nope}]\n")
    with pytest.raises(ValueError, match="unknown pipeline op"):
        load_spec(str(bad_op))
    bad_param = tmp_path / "bad_param.yaml"
    bad_param.write_text(
        "input: {path: x}\nsteps: [{op: strip_html, wrong_param: 1}]\n")
    with pytest.raises(ValueError, match="unknown params"):
        load_spec(str(bad_param))
    missing = tmp_path / "missing.yaml"
    missing.write_text("input: {path: x}\nsteps: [{op: filter}]\n")
    with pytest.raises(ValueError, match="missing required"):
        load_spec(str(missing))
    # undefined env var rejected at load
    bad_env = tmp_path / "bad_env.yaml"
    bad_env.write_text("input: {path: '${NOPE_VAR_42}'}\nsteps: []\n")
    with pytest.raises(ValueError, match="undefined env var"):
        load_spec(str(bad_env))


def test_cli_watch_incremental(ray_session, tmp_path, capsys):
    """Watch mode: files appearing between ticks get extracted exactly once
    (VERDICT r1 item 10 — the reference's run.py polling loop)."""
    import glob

    import ray.data as rd

    indir = tmp_path / "incoming"
    indir.mkdir()
    out = str(tmp_path / "watched")
    t1, _ = make_tables(5, seed=1)
    pq.write_table(t1, indir / "a.parquet")

    assert main(["watch", "--input", str(indir), "--out", out,
                 "--interval", "0.01", "--max-ticks", "2"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["files"] == 1 and lines[0]["new_rows"] == t1.num_rows
    assert lines[1]["files"] == 0  # second tick: nothing new

    # new file appears -> only IT is processed on the next run
    t2, _ = make_tables(3, seed=2)
    pq.write_table(t2, indir / "b.parquet")
    assert main(["watch", "--input", str(indir), "--out", out,
                 "--interval", "0.01", "--max-ticks", "1"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["files"] == 1 and lines[0]["new_rows"] == t2.num_rows

    total = sum(
        rd.read_parquet(d).count()
        for d in glob.glob(f"{out}/batch_*/data"))
    assert total == t1.num_rows + t2.num_rows
