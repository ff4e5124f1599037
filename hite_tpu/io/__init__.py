from hite_tpu.io.fasta import (  # noqa: F401
    read_fasta,
    write_fasta,
    encode_seq,
    decode_seq,
)
