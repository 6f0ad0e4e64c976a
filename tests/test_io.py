"""IO layer tests: parser quirks, crawler order, report format."""

import numpy as np
import pytest

from sparksmithwaterman_tpu.io import (
    build_report,
    encode_seq,
    format_matrices,
    get_reads,
    get_ref_seqs,
    is_metadata,
    iter_files,
    write_str_to_file,
)
from sparksmithwaterman_tpu.core import oracle
from sparksmithwaterman_tpu.core.oracle import align_chars


def test_get_reads_first_line_metadata(tmp_path):
    p = tmp_path / "input1.fa"
    p.write_text(">gi|meta\nACGT\nTTTT\n")
    assert get_reads(p, ">gi") == ["ACGT", "TTTT"]


def test_get_reads_first_line_not_metadata(tmp_path):
    # First line is a read when it is not metadata (InOutOps.java:69-72).
    p = tmp_path / "input1.fa"
    p.write_text("ACGT\nTTTT")
    assert get_reads(p, ">gi") == ["ACGT", "TTTT"]


def test_get_reads_lines_not_joined_and_trimmed(tmp_path):
    # Each line is one read; lines are trimmed but kept even when empty.
    p = tmp_path / "input1.fa"
    p.write_text("  ACGT \nGG GG\n\nTT\n")
    assert get_reads(p, ">gi") == ["ACGT", "GG GG", "", "TT"]


def test_get_ref_seqs_multi(tmp_path):
    p = tmp_path / "ref1.rna.fna"
    p.write_text(">gi|1|first\nAC\nGT\n>gi|2|second\nTTTT\n")
    refs = get_ref_seqs(p, ">gi")
    assert refs == [(">gi|1|first", "ACGT"), (">gi|2|second", "TTTT")]


def test_get_ref_seqs_no_leading_metadata(tmp_path):
    p = tmp_path / "bad.fna"
    p.write_text("ACGT\n")
    with pytest.raises(ValueError):
        get_ref_seqs(p, ">gi")


def test_is_metadata_prefix():
    assert is_metadata(">gi|123", ">gi")
    assert not is_metadata("ACGT", ">gi")
    assert not is_metadata(">g", ">gi")


def test_iter_files_sorted_dfs(tmp_path):
    (tmp_path / "b").mkdir()
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "y.txt").write_text("")
    (tmp_path / "a" / "x.txt").write_text("")
    (tmp_path / "b" / "z.txt").write_text("")
    (tmp_path / "top.txt").write_text("")
    rel = [p.replace(str(tmp_path) + "/", "") for p in iter_files(tmp_path)]
    assert rel == ["a/x.txt", "a/y.txt", "b/z.txt", "top.txt"]


def test_iter_files_missing_root():
    with pytest.raises(FileNotFoundError):
        list(iter_files("/nonexistent/dir/xyz"))


def test_encode_seq_uppercases():
    np.testing.assert_array_equal(encode_seq("acGT"), encode_seq("ACgt"))


def test_build_report_golden():
    # Byte-exact golden of GetOutputStr (InOutOps.java:244-288).
    report = build_report(
        reads=["ACGT", "TT"],
        num_refs=3,
        num_reads=2,
        max_score=15,
        exec_time_ms=42,
        opt=[
            (
                (">gi|1|ref", "AACGTT"),
                [(2, ("ACGT", "ACGT")), (5, ("T_T", "TAT"))],
            )
        ],
    )
    expected = (
        "Execution Time = 42 ms\n"
        "\n"
        "# Reference Sequences = 3\n"
        "# Reads = 2\n"
        "\n"
        "Input:\n"
        "ACGT\n"
        "TT\n"
        "\n"
        "Maximum alignment score = 15\n"
        "Reference:\n"
        ">gi|1|ref\n"
        "AACGTT\n"
        "\n"
        "\tIndex = 2\n"
        "\tACGT\n"
        "\tACGT\n"
        "\n"
        "\tIndex = 5\n"
        "\tT_T\n"
        "\tTAT\n"
        "\n"
    )
    assert report == expected


def test_format_matrices_golden():
    # PrintMatrices (InOutOps.java:316-383) on the hand-worked example.
    scores, dirs, _, _ = oracle.fill_matrices("ACGT", "CG")
    aligns = align_chars(dirs)
    out = format_matrices(scores, aligns, "ACGT", "CG")
    expected = (
        "\n"
        "   _  A  C  G  T  \n"
        "_  0  0  0  0  0  \n"
        "C  0  0  5  1  0  \n"
        "G  0  0  1  10 6  \n"
        "\n"
        "   _  A  C  G  T  \n"
        "_  -  -  -  -  -  \n"
        "C  -  -  a  d  -  \n"
        "G  -  -  i  a  d  \n"
    )
    assert out == expected


def test_write_str_to_file_creates_dirs(tmp_path):
    target = tmp_path / "out" / "nested" / "r.txt"
    assert write_str_to_file(target, "hello")
    assert target.read_text() == "hello"


def test_native_parser_matches_python(tmp_path):
    # Byte-for-byte parity of csrc/fasta.c vs the Python line parser on
    # a file exercising: multi-record, empty sequence record, blank
    # lines, \r\n endings, whitespace inside sequence lines.
    import pytest

    from sparksmithwaterman_tpu.io import fasta

    try:
        from sparksmithwaterman_tpu.io._native_io import parse_ref_native
        parse_ref_native.__wrapped__ if False else None
    except Exception:
        pytest.skip("native toolchain unavailable")

    p = tmp_path / "r.fna"
    content = (
        ">gi|1|first record  \n"
        "ACGT\r\n"
        "  TTAA\n"
        "\n"
        ">gi|2|empty\n"
        ">gi|3|last\n"
        "acgtACGT\n"
    )
    p.write_bytes(content.encode())
    try:
        got = parse_ref_native(p, ">gi")
    except RuntimeError:
        pytest.skip("native build failed")
    want = fasta._get_ref_seqs_py(p, ">gi")
    assert got == want


def test_native_parser_error_parity(tmp_path):
    import pytest

    from sparksmithwaterman_tpu.io import fasta

    try:
        from sparksmithwaterman_tpu.io._native_io import parse_ref_native
    except Exception:
        pytest.skip("native toolchain unavailable")

    p = tmp_path / "bad.fna"
    p.write_text("ACGT\n>gi|1|x\nACGT\n")
    try:
        with pytest.raises(ValueError):
            parse_ref_native(p, ">gi")
    except RuntimeError:
        pytest.skip("native build failed")
    with pytest.raises(ValueError):
        fasta._get_ref_seqs_py(p, ">gi")
    empty = tmp_path / "empty.fna"
    empty.write_text("")
    with pytest.raises(ValueError):
        parse_ref_native(empty, ">gi")
