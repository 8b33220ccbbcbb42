"""Relational operators: LSH candidates, Jaccard verify, connected components,
substring pass, top-k query, dedup variants, similarity search."""
