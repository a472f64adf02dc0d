"""Dataset -> Dataset transforms. Each stage is a composition of
``map_batches`` (zero-copy Arrow) and at most one keyed shuffle, with
partial aggregation pushed into the map side wherever semantics allow."""
