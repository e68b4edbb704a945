"""Shared test helpers."""


def slice_fasta(src, dst, n_reads):
    """First n_reads records of a 2-line-per-record fasta."""
    with open(src) as f, open(dst, "w") as out:
        count = 0
        for line in f:
            if line.startswith(">"):
                count += 1
                if count > n_reads:
                    break
            out.write(line)
