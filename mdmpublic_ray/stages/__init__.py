"""Pipeline stages: each is a function Dataset → Dataset built from
map_batches / groupby / sort primitives (SURVEY.md §7.2)."""
