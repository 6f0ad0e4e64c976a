from sparksmithwaterman_tpu.io.fasta import (
    decode_seq,
    encode_seq,
    get_reads,
    get_ref_seqs,
    is_metadata,
)
from sparksmithwaterman_tpu.io.crawler import iter_files
from sparksmithwaterman_tpu.io.report import (
    build_report,
    format_matrices,
    write_str_to_file,
)

__all__ = [
    "get_reads",
    "get_ref_seqs",
    "is_metadata",
    "encode_seq",
    "decode_seq",
    "iter_files",
    "build_report",
    "format_matrices",
    "write_str_to_file",
]
