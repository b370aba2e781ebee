"""Distribution: device mesh, sharded search step, collective top-k merge."""
