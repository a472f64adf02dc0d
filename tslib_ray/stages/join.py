"""Broadcast (map-side) joins: the shuffle-free join family for the common
"big fact table x small key set" shape.

At 100-TB scale a hash join on the fact table is an all-to-all exchange of
every block; when one side fits in a worker's heap (top-k keys, a dimension
slice, a dedup id set) the right plan is to ``ray.put`` the small side ONCE
and filter/enrich inside ``map_batches`` — each task reads the shared
object-store copy zero-copy, nothing is re-shipped per batch (ray_guide
"broadcast small sides"). The same pattern backs the minhash anti-join
(stages/dedup.py) and the ANN query broadcast (stages/ann.py).

For key sets too big for one heap the scale path is a Bloom filter built the
same way (bit array via ``ray.put``; false positives resolved by a second
exact pass over the ~|small|-sized survivor set) — the exact ``np.isin``
used here is the oracle-checkable variant and is itself vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def broadcast_semi_join(ds: "rd.Dataset", key: str,
                        keys: "np.ndarray | list") -> "rd.Dataset":
    """Keep rows of ``ds`` whose ``key`` is in the (small) ``keys`` set.

    ``keys`` is put into the object store once; every map task reads the
    same copy. Sorted-array ``np.isin`` is O(batch * log |keys|) and
    allocation-light.
    """
    keys_arr = np.sort(np.asarray(keys))
    ref = ray.put(keys_arr)

    def fn(b: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        col = b[key].to_numpy(zero_copy_only=False)
        mask = np.isin(col, ks)
        return b.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def broadcast_anti_join(ds: "rd.Dataset", key: str,
                        keys: "np.ndarray | list") -> "rd.Dataset":
    """Drop rows of ``ds`` whose ``key`` is in the (small) ``keys`` set."""
    keys_arr = np.sort(np.asarray(keys))
    ref = ray.put(keys_arr)

    def fn(b: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        col = b[key].to_numpy(zero_copy_only=False)
        mask = ~np.isin(col, ks)
        return b.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def broadcast_lookup_join(ds: "rd.Dataset", key: str,
                          lookup: dict[str, "np.ndarray"],
                          lookup_key: str) -> "rd.Dataset":
    """Inner-join ``ds`` against a small columnar lookup table (dict of
    name -> 1-D array; ``lookup_key`` names the join column inside it).

    The lookup is broadcast once; each batch resolves positions with
    ``np.searchsorted`` against the sorted key column — no shuffle, no
    per-batch re-ship, misses dropped (inner semantics).
    """
    order = np.argsort(np.asarray(lookup[lookup_key]), kind="stable")
    sorted_cols = {name: np.asarray(col)[order]
                   for name, col in lookup.items()}
    ref = ray.put(sorted_cols)
    payload_names = [n for n in lookup if n != lookup_key]

    def fn(b: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        keys_sorted = lk[lookup_key]
        col = b[key].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys_sorted, col)
        pos_c = np.minimum(pos, len(keys_sorted) - 1)
        hit = keys_sorted[pos_c] == col
        b = b.filter(pa.array(hit))
        pos = pos_c[hit]
        for name in payload_names:
            b = b.append_column(name, pa.array(lk[name][pos]))
        return b

    return ds.map_batches(fn, batch_format="pyarrow")
