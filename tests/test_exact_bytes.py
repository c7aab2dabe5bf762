"""Exact-byte line identity (SURVEY.md §1.4) + normalized dedup."""

from __future__ import annotations

from pyspark.sql import Row

from dataset_batch_processor_spark.operators import textops
from dataset_batch_processor_spark.sources import text as text_src


def test_read_lines_exact_termination(spark, tmp_path):
    d = tmp_path / "t"
    d.mkdir()
    (d / "term.txt").write_text("abc\ndef\n")       # fully terminated
    (d / "unterm.txt").write_text("abc\ndef")       # last line no newline
    (d / "empty.txt").write_text("")                # no lines at all
    rows = text_src.read_lines_exact(spark, str(d)).collect()
    got = {(r.input_file, r.line_no): (r.value, r.is_terminated) for r in rows}
    assert got == {
        ("term.txt", 0): ("abc", True),
        ("term.txt", 1): ("def", True),
        ("unterm.txt", 0): ("abc", True),
        ("unterm.txt", 1): ("def", False),  # the byte-identity bit
    }


def test_dedup_exact_bytes_keeps_terminated_distinct(spark, tmp_path):
    d = tmp_path / "t"
    d.mkdir()
    # "x\n", "x\n", then final unterminated "x" — reference semantics
    # (set of raw readlines) keeps TWO entries: "x\n" and "x"
    (d / "f.txt").write_text("x\nx\nx")
    lines = text_src.read_lines_exact(spark, str(d))
    kept = textops.dedup_lines_exact_bytes(lines).collect()
    assert {(r.value, r.is_terminated, r.first_line_no) for r in kept} == {
        ("x", True, 0),
        ("x", False, 2),
    }


def test_dedup_normalized(spark):
    lines = spark.createDataFrame(
        [
            Row(line_no=0, input_file="f", value="Hello "),
            Row(line_no=1, input_file="f", value="hello"),
            Row(line_no=2, input_file="f", value="world"),
        ]
    )
    got = {
        r.line_key: (r.first_line_no, r.n_variants)
        for r in textops.dedup_lines_normalized(lines).collect()
    }
    assert got == {"hello": (0, 2), "world": (2, 1)}
