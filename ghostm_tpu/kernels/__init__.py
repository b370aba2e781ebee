"""Device compute: seed lookup, candidate voting, banded Smith-Waterman."""
