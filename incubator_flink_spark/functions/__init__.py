"""Function kits: portable hashing (engine-agnostic deterministic hashes),
text analysis primitives, and the Flink-name compatibility layer."""
