"""Source adapters: corpus line reader, incremental ingest, XML flattener."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from manga_ocr_ray.sources import (
    IncrementalParquetSource,
    flatten_xml,
    read_corpus_lines,
    read_csv_table,
)


def test_read_csv_table_roundtrip(ray_session, tmp_path):
    """S5: quoting/escapes/unicode survive the CSV dialect defaults."""
    import pandas as pd

    df = pd.DataFrame({
        "id": [1, 2, 3],
        "name": ['plain', 'with,comma', 'quote "q" and\nnewline'],
        "ja": ["こんにちは", "世界", ""],
    })
    p = tmp_path / "meta.csv"
    df.to_csv(p, index=False)
    got = read_csv_table(str(p)).to_pandas().sort_values("id").reset_index(drop=True)
    # Arrow CSV reads empty string as null — normalize like the pipelines do
    got["ja"] = got["ja"].fillna("")
    pd.testing.assert_frame_equal(got, df)


def test_read_corpus_lines(ray_session, tmp_path):
    p = tmp_path / "ja.txt"
    p.write_text("keep this line\nok\n  \nanother kept line\nab\n")
    ds = read_corpus_lines(str(p), min_chars=3, source="cc-100")
    rows = ds.take_all()
    # block order is not guaranteed under streaming execution — compare as sets
    assert {r["line"] for r in rows} == {"keep this line", "another kept line"}
    assert all(r["source"] == "cc-100" for r in rows)
    assert len({r["line_id"] for r in rows}) == 2  # ids unique
    # ids deterministic for a fixed input
    rows2 = read_corpus_lines(str(p), min_chars=3, source="cc-100").take_all()
    assert {r["line_id"] for r in rows} == {r["line_id"] for r in rows2}
    # ids are stable input coordinates (file + line number), so identical
    # lines in different files / positions never collide
    ids = {r["line_id"]: r["line"] for r in rows}
    assert ids == {"cc-100_ja.txt_0": "keep this line",
                   "cc-100_ja.txt_3": "another kept line"}


def test_read_corpus_lines_ids_stable_across_parallelism(ray_session, tmp_path):
    """line_id must not depend on block boundaries (ADVICE r1: the old batch-
    prefix-hash ids shifted with read parallelism)."""
    files = []
    for i in range(4):
        p = tmp_path / f"part{i}.txt"
        p.write_text("".join(f"line {i} {j} content\n" for j in range(20)))
        files.append(str(p))
    a = {r["line_id"] for r in read_corpus_lines(files).take_all()}
    b = {r["line_id"]
         for r in read_corpus_lines(list(reversed(files))).take_all()}
    assert a == b and len(a) == 80


def test_incremental_source_diff_commit(ray_session, tmp_path):
    data = tmp_path / "in"
    data.mkdir()
    state = str(tmp_path / "seen.json")
    pq.write_table(pa.table({"x": [1, 2]}), data / "a.parquet")

    src = IncrementalParquetSource(str(data), state)
    ds = src.read_new()
    assert ds is not None and ds.count() == 2
    src.commit()

    # nothing new -> None
    assert IncrementalParquetSource(str(data), state).read_new() is None

    # a new file appears -> only IT is read
    pq.write_table(pa.table({"x": [3]}), data / "b.parquet")
    src2 = IncrementalParquetSource(str(data), state)
    ds2 = src2.read_new()
    assert ds2.count() == 1
    # uncommitted diff is re-offered after restart (at-least-once)
    assert IncrementalParquetSource(str(data), state).diff() == [
        str(data / "b.parquet")
    ]
    src2.commit()
    assert IncrementalParquetSource(str(data), state).read_new() is None

    # modifying a seen file re-offers it
    pq.write_table(pa.table({"x": [3, 4]}), data / "b.parquet")
    assert IncrementalParquetSource(str(data), state).diff() == [
        str(data / "b.parquet")
    ]


def test_flatten_xml():
    batch = pa.table({
        "book": ["b1", "b2", "bad"],
        "xml": [
            '<page><item id="1">hello</item><item id="2">world</item></page>',
            '<page><item id="9">solo</item></page>',
            "<unclosed",
        ],
    })
    out = flatten_xml(batch, tag="item", attrs=("id",))
    assert out.column_names == ["book", "text", "id"]
    assert out["book"].to_pylist() == ["b1", "b1", "b2"]  # corrupt row skipped
    assert out["text"].to_pylist() == ["hello", "world", "solo"]
    assert out["id"].to_pylist() == ["1", "2", "9"]
