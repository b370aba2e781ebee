"""Input/output: FASTA/FASTQ parsing and result writing."""
