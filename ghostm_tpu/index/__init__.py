"""Database index: packed subject store, seed index, and disk (de)serialisation."""
