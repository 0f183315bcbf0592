"""Friendly input-format errors.

The reference aborts with bare parse failures on malformed input (its
kseq/fscanf paths have no diagnostics; SURVEY §5 "error handling:
none"). We do better: readers raise InputFormatError with the file,
line/record, and what was expected; the CLI catches it and exits 1
with the message instead of a traceback.
"""


class InputFormatError(ValueError):
    """Malformed FASTA/PHYLIP/Newick input with a human-readable
    diagnosis."""
