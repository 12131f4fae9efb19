"""Device-side compute primitives: RNG, intersection, BSDFs, compaction."""
