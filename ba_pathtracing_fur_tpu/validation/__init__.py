"""Independent validation oracles (reference-C++ transliterations)."""
