from dipper_tpu.io.fasta import read_fasta
from dipper_tpu.io.encode import (
    encode_2bit_codes,
    encode_4bit_codes,
    pack_2bit,
    pack_4bit,
)
from dipper_tpu.io.newick import Tree, parse_newick, write_newick
from dipper_tpu.io.phylip import read_phylip_lower_triangular, PhylipRowStream

__all__ = [
    "read_fasta",
    "encode_2bit_codes",
    "encode_4bit_codes",
    "pack_2bit",
    "pack_4bit",
    "Tree",
    "parse_newick",
    "write_newick",
    "read_phylip_lower_triangular",
    "PhylipRowStream",
]
