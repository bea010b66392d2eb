"""Zero-copy helpers for embedding / packed-payload columns.

Arrow list columns become numpy matrices via flatten + reshape — never
``to_pylist()`` (a per-row Python loop that dominated the round-1 ANN
bench). uint64 / float64 row payloads ride through shuffles and Acero
joins as packed *binary* columns (Acero rejects list-typed non-key
fields), packed and unpacked with buffer-level numpy views.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def vecs_np(col, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from a FixedSizeList / List column, zero-copy up to
    the final dtype cast. Assumes rectangular lists without nulls."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_fixed_size_list(t):
        dim = t.list_size
        flat = col.flatten()
        return flat.to_numpy(zero_copy_only=False).astype(dtype, copy=False).reshape(len(col), dim)
    counts = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if len(counts) == 0:
        return np.empty((0, 0), dtype=dtype)
    dim = int(counts[0])
    flat = pc.list_flatten(col)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat.to_numpy(zero_copy_only=False).astype(dtype, copy=False).reshape(-1, dim)


def normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1, n)


def _binary_from_offsets(n: int, offsets_bytes: np.ndarray, data: np.ndarray) -> pa.Array:
    if len(offsets_bytes) and int(offsets_bytes[-1]) > np.iinfo(np.int32).max:
        # int32 offsets would silently wrap and corrupt the column; fall
        # back to large_binary (int64 offsets) for >2 GiB packed batches
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(),
            n,
            [None, pa.py_buffer(offsets_bytes.astype(np.int64).tobytes()),
             pa.py_buffer(np.ascontiguousarray(data).tobytes())],
        )
    return pa.BinaryArray.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(offsets_bytes.astype(np.int32).tobytes()),
         pa.py_buffer(np.ascontiguousarray(data).tobytes())],
    )


def pack_u64_rows(mat: np.ndarray) -> pa.Array:
    """(n, w) fixed-width matrix -> binary column, itemsize*w bytes/row."""
    n, w = mat.shape
    offsets = np.arange(n + 1, dtype=np.int64) * (w * mat.dtype.itemsize)
    return _binary_from_offsets(n, offsets, np.ascontiguousarray(mat).view(np.uint8))


def pack_u64_var(flat: np.ndarray, counts: np.ndarray) -> pa.Array:
    """Variable-length uint64 rows (``counts[i]`` values each) -> binary."""
    offsets = np.concatenate(([0], np.cumsum(counts, dtype=np.int64))) * 8
    return _binary_from_offsets(len(counts), offsets, np.ascontiguousarray(flat).view(np.uint8))


def unpack_u64(col, dtype=np.uint64) -> tuple[np.ndarray, np.ndarray]:
    """binary column -> (flat values, per-row counts). Buffer-level; the
    one copy is the alignment copy before the 8-byte view."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_binary(col.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=dtype), np.empty(0, dtype=np.int64)
    bufs = col.buffers()
    if bufs[1] is None:  # all-null column: no offsets/data buffers
        return np.empty(0, dtype=dtype), np.zeros(n, dtype=np.int64)
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[col.offset : col.offset + n + 1]
    data = (np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None
            else np.empty(0, dtype=np.uint8))
    flat = data[offs[0] : offs[-1]].copy().view(dtype)
    counts = (np.diff(offs) // np.dtype(dtype).itemsize).astype(np.int64)
    return flat, counts
