"""S4/S5: bulk vector loaders + migration pipeline.

Reference semantics (file:line into /root/reference):
- ``load_faiss_data`` reads a ``.npy`` matrix or a FAISS index
  (``faiss.read_index`` + ``reconstruct_n``) plus JSON metadata in either
  list-form or dict-keyed form, truncating to a consistent length
  (scripts/migrate_from_faiss.py:57-115).
- ``run_migration`` loads in batches with progress and a verification
  search afterwards (scripts/migrate_from_faiss.py:153-255,257-321).

Spark-first restatement: the vector file is read DISTRIBUTED via
``binaryFile`` + Arrow-batched ``mapInPandas`` decode (the codec is NumPy's
own parser, not SQL); metadata rides ``spark.read.json``-compatible files;
the "batched migration loop" collapses to ONE ``df.write`` job — Spark's
task scheduler is the batching.  FAISS itself is not in this container, so
that branch is gated behind an import-try (the ``.npy`` path is the
fully-functional one, matching the reference's own fallback order).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NPY_ROW_SCHEMA = "src_file string, row_idx bigint, embedding array<double>"


def read_npy_vectors(spark: SparkSession, path: str) -> DataFrame:
    """Distributed ``.npy`` reader: ``binaryFile`` scan → NumPy header parse
    per file inside ``mapInPandas`` (Arrow batches out).

    Returns (src_file, row_idx, embedding) with ``row_idx`` file-relative —
    the migration key the reference zips metadata against
    (migrate_from_faiss.py:105-109).  At 100 TB the input is many shards and
    each executor decodes its own files; a single mega-file should be
    re-sharded first (binary formats aren't splittable).  Directory inputs
    are filtered to ``*.npy`` so sidecar files (metadata JSON) are ignored.
    """
    files = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.npy").load(path)
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                arr = np.load(io.BytesIO(bytes(content)))
                if arr.ndim != 2:
                    raise ValueError(f"{fpath}: expected (N, D) matrix, got {arr.shape}")
                yield pd.DataFrame(
                    {
                        "src_file": fpath,
                        "row_idx": np.arange(arr.shape[0], dtype=np.int64),
                        "embedding": list(arr.astype(np.float64)),
                    }
                )

    return files.select("path", "content").mapInPandas(parse, NPY_ROW_SCHEMA)


def _resolve_shard_path(fpath: str):
    """Classify a ``binaryFile`` path string (Hadoop Path.toString: NOT
    percent-encoded, Hadoop scheme names) for a ranged read.  Returns
    ``("local", local_path)`` for file: URIs (opened directly — literal
    spaces etc. stay intact), else ``("remote", encoded_uri, cache_key,
    path_in_fs)`` where ``encoded_uri`` is percent-encoded for
    ``pyarrow.fs.FileSystem.from_uri``, ``cache_key`` identifies the
    filesystem to reuse per (scheme, bucket), and ``path_in_fs`` is the
    pyarrow-side path (bucket/key for s3; None → use from_uri's own)."""
    import re
    from urllib.parse import quote, urlsplit

    if fpath.startswith("file:"):
        local = fpath[len("file:") :]
        if local.startswith("//"):  # file:///x or file://host/x
            local = "/" + local.lstrip("/")
        return ("local", local)
    uri = re.sub(r"^s3[an]://", "s3://", fpath)
    encoded = quote(uri, safe=":/")  # from_uri decodes this back
    if encoded.split("://", 1)[0] == "s3":
        bucket_key = uri.split("://", 1)[1]  # pyarrow S3 path form
        return ("remote", encoded, "s3://" + bucket_key.split("/", 1)[0], bucket_key)
    # Non-S3 remotes (hdfs, gs, abfs, …): key the client cache on
    # scheme+authority, NOT the full URI — the full URI differs per shard,
    # so keying on it would never hit and a new FileSystem client would be
    # built per shard.  The in-FS path is derived lazily (the URI→path
    # mapping is filesystem-specific) — see _fs_and_path.
    parts = urlsplit(encoded)
    return ("remote", encoded, f"{parts.scheme}://{parts.netloc}", None)


def _fs_and_path(resolved, fs_cache: dict, pafs):
    """(pyarrow FileSystem, in-FS path) for a remote shard resolved by
    ``_resolve_shard_path``, creating at most ONE FileSystem client per
    (scheme, authority) cache key.  pyarrow's ``from_uri`` maps a URI to
    an in-FS path differently per filesystem — host-style keeps only the
    path (``hdfs://h:p/a/b`` → ``/a/b``), bucket-style keeps
    authority+path (``gs://bkt/k`` → ``bkt/k``) — so the mapping is
    LEARNED from the first file per cache key and replayed for the rest;
    an unrecognized mapping falls back to per-file ``from_uri`` (correct,
    just uncached)."""
    from urllib.parse import unquote, urlsplit

    _, encoded, cache_key, path_in_fs = resolved
    entry = fs_cache.get(cache_key)
    if entry is None:
        fs_, p0 = pafs.FileSystem.from_uri(encoded)
        if path_in_fs is not None:  # s3: path form is known a priori
            style = "s3"
        else:
            parts = urlsplit(encoded)
            if p0 == unquote(parts.path):
                style = "host"
            elif p0 == unquote(parts.netloc + parts.path):
                style = "bucket"
            else:
                style = None
        fs_cache[cache_key] = (fs_, style)
        return fs_, (path_in_fs if path_in_fs is not None else p0)
    fs_, style = entry
    if path_in_fs is not None:
        return fs_, path_in_fs
    parts = urlsplit(encoded)
    if style == "host":
        return fs_, unquote(parts.path)
    if style == "bucket":
        return fs_, unquote(parts.netloc + parts.path)
    return pafs.FileSystem.from_uri(encoded)


def _npy_header_nbytes(head: bytes) -> int:
    """Total prefix bytes (magic + version + HEADER_LEN + header) DECLARED
    by the first 12 bytes of an npy file — lets the ranged header read
    grow past its 4 KiB first guess when a large structured dtype pushes
    the header over it; without this numpy's parser fails opaquely on the
    truncated buffer."""
    if len(head) < 12 or head[:6] != b"\x93NUMPY":
        return len(head)  # not npy / truncated — let the parser raise its own error
    if head[6] == 1:  # v1: 2-byte little-endian HEADER_LEN at offset 8
        return 10 + int.from_bytes(head[8:10], "little")
    return 12 + int.from_bytes(head[8:12], "little")  # v2/v3: 4-byte


def read_npy_shard_counts(spark: SparkSession, path: str) -> DataFrame:
    """(src_file, cnt) per ``.npy`` shard from the npy HEADERS alone — a
    true metadata pass.  The ``binaryFile`` scan projects ONLY the ``path``
    column (the source builds rows from the required schema, so the file
    bytes are never read or shipped), and each task then issues one ranged
    read of the first 4 KiB per shard via ``pyarrow.fs`` — enough for any
    ordinary npy v1/v2 header, and the read grows to the DECLARED
    HEADER_LEN when a large structured dtype exceeds it.  At 100 TB this
    is the difference between a metadata
    pass (one small ranged GET per shard) and a second full I/O pass over
    the corpus."""
    files = (
        spark.read.format("binaryFile").option("pathGlobFilter", "*.npy").load(path)
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from numpy.lib import format as npf
        from pyarrow import fs as pafs

        # _resolve_shard_path handles the binaryFile path quirks; the
        # resolved filesystem is cached per (scheme, bucket) — one client
        # per task, not per shard
        fs_cache: dict[str, object] = {}

        def read_header(fpath: str) -> bytes:
            resolved = _resolve_shard_path(fpath)
            if resolved[0] == "local":

                def ranged(n: int) -> bytes:
                    with open(resolved[1], "rb") as fh:
                        return fh.read(n)

            else:
                fs_, path_in_fs = _fs_and_path(resolved, fs_cache, pafs)

                def ranged(n: int) -> bytes:
                    with fs_.open_input_file(path_in_fs) as fh:
                        return fh.read_at(n, 0)

            head = ranged(4096)
            need = _npy_header_nbytes(head)
            if need > len(head):  # >4 KiB header (huge structured dtype)
                head = ranged(need)
            return head

        for pdf in batches:
            names, cnts = [], []
            for fpath in pdf["path"]:
                head = read_header(fpath)
                f = io.BytesIO(head)
                version = npf.read_magic(f)
                if version == (1, 0):
                    shape, _, _ = npf.read_array_header_1_0(f)
                else:
                    shape, _, _ = npf.read_array_header_2_0(f)
                if len(shape) != 2:
                    raise ValueError(f"{fpath}: expected (N, D) matrix, got {shape}")
                names.append(fpath)
                cnts.append(shape[0])
            yield pd.DataFrame({"src_file": names, "cnt": cnts})

    return files.select("path").mapInPandas(parse, "src_file string, cnt bigint")


# FAISS index fourccs (public serialization format, faiss
# faiss/impl/index_write.cpp write_index / index_read.cpp read_index):
# IndexFlatIP → "IxFI", IndexFlatL2 → "IxF2", other metrics → "IxFl";
# IndexIVFFlat → "IwFl"; ArrayInvertedLists → "ilar" with "full" sizes.
_FAISS_FLAT_FOURCC = (b"IxFI", b"IxF2", b"IxFl")
_FAISS_IVFFLAT_FOURCC = b"IwFl"


def parse_faiss_flat_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexFlat*`` files — no faiss
    dependency.  Byte layout (public format, faiss/impl/index_write.cpp:
    ``write_index_header`` + ``WRITEXBVECTOR``; all little-endian):

      uint32  fourcc                  IxFI / IxF2 / IxFl
      int32   d
      int64   ntotal
      int64   dummy ×2                (1<<20 compat placeholders)
      uint8   is_trained              (C++ bool)
      int32   metric_type             (>1 ⇒ trailing float32 metric_arg)
      uint64  count                   number of float32s = ntotal·d
      float32 data[count]             the stored vectors, row-major

    The other mainstream families have their own pure-NumPy readers below
    (IVFFlat, HNSWFlat, IDMap, PQ and IVFPQ at every code width, every
    serialized ScalarQuantizer type); only unknown fourccs / unknown
    sub-layouts still require faiss.  Returns an (ntotal, d) float32
    ndarray view."""
    arr, _ = _parse_flat_at(buf, 0)
    return arr


def _parse_index_header(buf: bytes, off: int) -> tuple[int, int, int, int]:
    """``write_index_header``: d, ntotal, 2×idx_t placeholders, is_trained,
    metric_type (+metric_arg when >1).  Returns (d, ntotal, metric, off)."""
    import struct

    (d,) = struct.unpack_from("<i", buf, off)
    off += 4
    (ntotal,) = struct.unpack_from("<q", buf, off)
    off += 8
    off += 16  # two idx_t compat placeholders
    off += 1  # is_trained
    (metric_type,) = struct.unpack_from("<i", buf, off)
    off += 4
    if metric_type > 1:
        off += 4  # metric_arg (float32)
    return d, ntotal, metric_type, off


def _parse_flat_at(buf: bytes, off: int):
    """Parse one IndexFlat* segment starting at ``off`` (top-level file or
    nested, e.g. an IVF coarse quantizer); returns (ndarray, next_off)."""
    import struct

    import numpy as np

    fourcc = bytes(buf[off : off + 4])
    if fourcc not in _FAISS_FLAT_FOURCC:
        raise NotImplementedError(
            f"unsupported FAISS index fourcc {fourcc!r}: IndexFlat*, "
            "IVFFlat, HNSWFlat, IDMap, PQ/IVFPQ, ScalarQuantizer, and "
            "OPQ/PCA PreTransform wrappers decode without faiss; re-export "
            "as .npy or IndexFlat (the reference's own fallback, "
            "migrate_from_faiss.py:57-77)"
        )
    off += 4
    d, ntotal, _metric, off = _parse_index_header(buf, off)
    (count,) = struct.unpack_from("<Q", buf, off)
    off += 8
    if count != ntotal * d:
        raise ValueError(
            f"FAISS flat index corrupt: header says {ntotal}×{d} vectors "
            f"but payload holds {count} floats"
        )
    arr = np.frombuffer(buf, dtype="<f4", count=count, offset=off).reshape(ntotal, d)
    return arr, off + 4 * count


def parse_faiss_ivfflat_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexIVFFlat`` files — no faiss
    dependency.  IVF-*flat* inverted lists store the raw float32 vectors as
    their codes (code_size = 4·d), so reconstruction is a memcpy, exactly
    like IndexFlat.  Byte layout (public format, faiss/impl/index_write.cpp):

      uint32  fourcc "IwFl"
      --- write_ivf_header ---
      index_header                    (d, ntotal, 2×dummy, is_trained,
                                       metric_type[, metric_arg])
      uint64  nlist,  uint64 nprobe
      nested  write_index(quantizer)  (an IndexFlat* segment: the nlist
                                       centroids — parsed, then skipped)
      --- write_direct_map ---
      uint8   direct-map type,  uint64 array-size + int64 data[size]
      (+ for Hashtable maps: uint64 n + int64 pairs[2n] — skipped)
      --- write_InvertedLists (ArrayInvertedLists) ---
      uint32  fourcc "ilar",  uint64 nlist,  uint64 code_size
      uint32  fourcc "full" (uint64 n + sizes[n]) or "sprs"
              (uint64 2m + (list_no, size) pairs for non-empty lists)
      per non-empty list i:   uint8 codes[sizes[i]·code_size] (= float32·d),
                              then int64 ids[sizes[i]]  (codes FIRST —
                              index_write.cpp writes codes before ids)

    Returns ``(ids, vectors)`` — int64 stored ids and the (ntotal, d)
    float32 matrix, concatenated in inverted-list order."""
    import struct

    import numpy as np

    if bytes(buf[0:4]) != _FAISS_IVFFLAT_FOURCC:
        raise NotImplementedError(
            f"not an IndexIVFFlat file (fourcc {bytes(buf[0:4])!r})"
        )
    d, ntotal, _metric, off = _parse_index_header(buf, 4)
    (nlist,) = struct.unpack_from("<Q", buf, off)
    off += 8
    off += 8  # nprobe (serving knob, not needed to reconstruct)
    _centroids, off = _parse_flat_at(buf, off)  # coarse quantizer payload
    off = _parse_direct_map(buf, off)
    entries, _ = _parse_inverted_lists(buf, off, nlist, 4 * d)
    ids = (
        np.concatenate([e[1] for e in entries])
        if entries
        else np.empty(0, dtype=np.int64)
    )
    vecs = (
        np.concatenate([e[2].view("<f4").reshape(-1, d) for e in entries])
        if entries
        else np.empty((0, d), dtype=np.float32)
    )
    if vecs.shape[0] != ntotal:
        raise ValueError(
            f"IVFFlat corrupt: header ntotal {ntotal} != list payload {vecs.shape[0]}"
        )
    return ids.astype(np.int64), vecs


def _parse_direct_map(buf: bytes, off: int) -> int:
    """``write_direct_map`` (faiss/impl/index_write.cpp): uint8 type +
    array vector (uint64 count + int64 data), and for Hashtable (2) an
    additional vector of (id, idx) int64 pairs.  The direct map is a
    lookup accelerator, not data — reconstruction only needs to SKIP it.
    Returns the offset past the map."""
    import struct

    dm_type = buf[off]
    off += 1
    (dm_size,) = struct.unpack_from("<Q", buf, off)
    off += 8 + 8 * dm_size  # array entries (int64 each)
    if dm_type == 2:  # DirectMap::Hashtable — vector of int64 pairs
        (n_pairs,) = struct.unpack_from("<Q", buf, off)
        off += 8 + 16 * n_pairs
    elif dm_type not in (0, 1):  # NoMap / Array
        # NotImplementedError (not ValueError) so _decode_faiss_bytes can
        # still route the file to the faiss-library fallback when present
        raise NotImplementedError(f"unknown direct-map type {dm_type}")
    return off


def _parse_inverted_lists(buf: bytes, off: int, nlist: int, code_size: int):
    """``write_InvertedLists`` (ArrayInvertedLists): "ilar" + nlist +
    code_size + sizes vector — "full" (one size per list) or "sprs"
    ((list_no, size) pairs for non-empty lists, written when over half the
    lists are empty) — + per-non-empty-list payload.  Each
    non-empty list stores its CODES buffer first (sz·code_size raw uint8
    bytes) and the int64 ids after it — faiss/impl/index_write.cpp writes
    ``WRITEANDCHECK(codes)`` then ``WRITEANDCHECK(ids)``, and index_read.cpp
    reads in the same order.  Returns ([(list_idx, ids, codes), …],
    next_off) with empty lists omitted; codes stay raw uint8 rows of
    ``code_size``."""
    import struct

    import numpy as np

    if bytes(buf[off : off + 4]) != b"ilar":
        raise NotImplementedError(
            "only ArrayInvertedLists ('ilar') payloads decode without faiss"
        )
    off += 4
    (il_nlist,) = struct.unpack_from("<Q", buf, off)
    off += 8
    (il_code_size,) = struct.unpack_from("<Q", buf, off)
    off += 8
    if il_nlist != nlist or il_code_size != code_size:
        raise ValueError(
            f"inverted lists inconsistent: nlist {il_nlist} vs {nlist}, "
            f"code_size {il_code_size} vs {code_size}"
        )
    list_type = bytes(buf[off : off + 4])
    off += 4
    (n_sizes,) = struct.unpack_from("<Q", buf, off)
    off += 8
    raw = np.frombuffer(buf, dtype="<u8", count=n_sizes, offset=off)
    off += 8 * n_sizes
    if list_type == b"full":
        # sizes[i] per list, zeros included
        per_list = list(enumerate(raw.tolist()))
    elif list_type == b"sprs":
        # sparse encoding: (list_no, size) int64 pairs for non-empty lists
        if n_sizes % 2:
            raise ValueError("sprs sizes vector has odd length")
        per_list = list(zip(raw[0::2].tolist(), raw[1::2].tolist()))
    else:
        raise NotImplementedError(f"unknown inverted-list sizes type {list_type!r}")
    entries: list = []
    for li, sz in per_list:
        if sz == 0:
            continue
        # order matters: codes precede ids on disk (index_write.cpp) — the
        # per-list byte TOTAL is order-independent, so only reading in the
        # written order distinguishes vectors from garbage
        codes = np.frombuffer(
            buf, dtype=np.uint8, count=sz * code_size, offset=off
        ).reshape(sz, code_size)
        off += sz * code_size
        ids = np.frombuffer(buf, dtype="<i8", count=sz, offset=off)
        off += 8 * sz
        entries.append((li, ids, codes))
    return entries, off


def parse_faiss_hnswflat_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexHNSWFlat`` files — no faiss
    dependency.  HNSW-*flat* keeps the raw vectors in a nested IndexFlat
    storage AFTER the graph arrays, so decoding skips the graph and reads
    the flat payload (public format, faiss/impl/index_write.cpp
    ``write_HNSW``):

      uint32  fourcc "IHNf"
      index_header
      vector<double> assign_probas        (each: uint64 count + data)
      vector<int>    cum_nneighbor_per_level
      vector<int>    levels
      vector<uint64> offsets
      vector<int>    neighbors
      int32 ×5       entry_point, max_level, efConstruction, efSearch,
                     upper_beam           (count drifts across faiss
                                           versions — see scan below)
      nested  write_index(storage)        (IndexFlat*: the vectors)

    The scalar block between ``neighbors`` and the nested storage has
    changed across faiss releases, so rather than hard-coding its width the
    parser scans forward a bounded window for a valid IndexFlat segment
    whose header agrees with (d, ntotal) — alignment cannot false-positive
    on graph bytes because the fourcc + dimension + count must all match.
    Returns the (ntotal, d) float32 matrix."""
    import struct

    if bytes(buf[0:4]) != b"IHNf":
        raise NotImplementedError(
            f"not an IndexHNSWFlat file (fourcc {bytes(buf[0:4])!r})"
        )
    d, ntotal, _metric, off = _parse_index_header(buf, 4)
    for elem_size in (8, 4, 4, 8, 4):  # the five write_HNSW vectors
        (count,) = struct.unpack_from("<Q", buf, off)
        off += 8 + elem_size * count
    for skip in range(0, 65, 1):  # version-drifting scalar block
        try:
            arr, _ = _parse_flat_at(buf, off + skip)
        except (NotImplementedError, ValueError, struct.error):
            continue
        if arr.shape == (ntotal, d):
            return arr
    raise NotImplementedError(
        "IndexHNSWFlat storage segment not found — unrecognized faiss "
        "serialization revision; re-export as .npy or IndexFlat"
    )


def _parse_product_quantizer(buf: bytes, off: int):
    """``write_ProductQuantizer``: d, M, nbits (size_t each) + centroids
    vector (uint64 count + float32 data, count = M·2^nbits·(d/M)).
    Returns (d, M, nbits, centroids[M, ksub, dsub], next_off)."""
    import struct

    import numpy as np

    d, M, nbits = struct.unpack_from("<QQQ", buf, off)
    off += 24
    (count,) = struct.unpack_from("<Q", buf, off)
    off += 8
    ksub, dsub = 1 << nbits, d // M
    if count != M * ksub * dsub:
        raise ValueError(
            f"ProductQuantizer corrupt: centroids {count} != {M}·{ksub}·{dsub}"
        )
    cent = np.frombuffer(buf, dtype="<f4", count=count, offset=off).reshape(
        M, ksub, dsub
    )
    return d, M, nbits, cent, off + 4 * count


def _pq_code_indices(codes_raw, M: int, nbits: int):
    """Expand packed PQ code rows (n, code_size) to (n, M) subquantizer
    indices.  8-bit: one byte per code.  4-bit (PQEncoder4/PQDecoder4,
    faiss/impl/ProductQuantizer.h): two codes per byte, FIRST code in the
    low nibble.  Every other width uses PQEncoderGeneric's stream — codes
    packed back-to-back LSB-first — which the 4-bit layout is a special
    case of, so one unpackbits path covers all of them (nbits ≤ 16 per
    faiss's own limit)."""
    import numpy as np

    if nbits == 8:
        return codes_raw[:, :M]
    if nbits == 4:
        n, code_size = codes_raw.shape
        nib = np.empty((n, 2 * code_size), dtype=np.uint8)
        nib[:, 0::2] = codes_raw & 0x0F
        nib[:, 1::2] = (codes_raw >> 4) & 0x0F
        return nib[:, :M]
    if not 1 <= nbits <= 16:
        raise NotImplementedError(f"PQ with nbits={nbits} out of faiss's range")
    bits = np.unpackbits(codes_raw, axis=1, bitorder="little")
    idx = bits[:, : M * nbits].reshape(-1, M, nbits).astype(np.uint32)
    return (idx << np.arange(nbits, dtype=np.uint32)).sum(axis=2)


def parse_faiss_pq_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexPQ`` files — no faiss dependency.
    PQ codes decode by codebook lookup, which is exactly what faiss's own
    ``reconstruct_n`` does, so the result is bit-identical to the library
    path: the QUANTIZED vectors (PQ is lossy by construction — the original
    floats are not in the file).  Layout (faiss/impl/index_write.cpp):
    fourcc "IxPq", index_header, write_ProductQuantizer (d/M/nbits +
    centroids), codes vector (uint8, ntotal·code_size where code_size =
    ceil(M·nbits/8)), then search params (not needed).  All code widths
    decode: nbits=8 (byte-per-code), nbits=4 (nibble-packed, PQEncoder4),
    and every other 1..16-bit width via PQEncoderGeneric's LSB-first
    stream."""
    import struct

    import numpy as np

    if bytes(buf[0:4]) != b"IxPq":
        raise NotImplementedError(f"not an IndexPQ file (fourcc {bytes(buf[0:4])!r})")
    d, ntotal, _metric, off = _parse_index_header(buf, 4)
    pq_d, M, nbits, cent, off = _parse_product_quantizer(buf, off)
    if pq_d != d:
        raise ValueError(f"IndexPQ corrupt: header d {d} != quantizer d {pq_d}")
    code_size = (M * nbits + 7) // 8
    (n_codes,) = struct.unpack_from("<Q", buf, off)
    off += 8
    if n_codes != ntotal * code_size:
        raise ValueError(
            f"IndexPQ corrupt: codes {n_codes} != {ntotal}·{code_size}"
        )
    raw = np.frombuffer(buf, dtype=np.uint8, count=n_codes, offset=off).reshape(
        ntotal, code_size
    )
    codes = _pq_code_indices(raw, M, nbits)
    # decode: vec[m·dsub:(m+1)·dsub] = centroids[m, code[m]]
    out = np.empty((ntotal, d), dtype=np.float32)
    dsub = d // M
    for m in range(M):
        out[:, m * dsub : (m + 1) * dsub] = cent[m, codes[:, m]]
    return out


def parse_faiss_sq_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexScalarQuantizer`` files — no
    faiss dependency.  SQ decode is a per-dim affine dequantization, the
    same arithmetic faiss's ``reconstruct_n`` runs.  Layout
    (faiss/impl/index_write.cpp): fourcc "IxSQ", index_header,
    write_ScalarQuantizer (qtype int32, rangestat int32, rangestat_arg
    float32, d size_t, code_size size_t, trained float vector), codes
    vector (uint8).  Supported qtypes:

      QT_8bit (0)         trained = [vmin[d], vdiff[d]];
                          x[i] = vmin[i] + (code[i] + 0.5)/255 · vdiff[i]
      QT_4bit (1)         nibble-packed (Codec4bit: component i in the low
                          nibble of byte i/2 for even i, high for odd;
                          code_size = ceil(d/2));
                          x[i] = vmin[i] + (nib[i] + 0.5)/15 · vdiff[i]
      QT_8bit_uniform (2) trained = [vmin, vdiff] (scalars, 8-bit formula)
      QT_4bit_uniform (3) scalar vmin/vdiff, 4-bit nibble formula
      QT_fp16 (4)         codes are little-endian float16 pairs
      QT_8bit_direct (5)  x[i] = code[i]
      QT_6bit (6)         Codec6bit: 3 bytes per 4 components, little-
                          endian bit order (component 0 in byte0 bits 0-5,
                          1 in byte0 bits 6-7 + byte1 bits 0-3, …);
                          x[i] = vmin[i] + (c6[i] + 0.5)/63 · vdiff[i]
      QT_bf16 (7)         codes are bfloat16 pairs (high half of float32)
      QT_8bit_direct_signed (8)  x[i] = code[i] - 128"""
    import struct

    import numpy as np

    if bytes(buf[0:4]) != b"IxSQ":
        raise NotImplementedError(
            f"not an IndexScalarQuantizer file (fourcc {bytes(buf[0:4])!r})"
        )
    d, ntotal, _metric, off = _parse_index_header(buf, 4)
    (qtype,) = struct.unpack_from("<i", buf, off)
    off += 4
    off += 4  # rangestat (int32)
    off += 4  # rangestat_arg (float32)
    (sq_d,) = struct.unpack_from("<Q", buf, off)
    off += 8
    (code_size,) = struct.unpack_from("<Q", buf, off)
    off += 8
    (n_trained,) = struct.unpack_from("<Q", buf, off)
    off += 8
    trained = np.frombuffer(buf, dtype="<f4", count=n_trained, offset=off)
    off += 4 * n_trained
    if sq_d != d:
        raise ValueError(f"IndexSQ corrupt: header d {d} != quantizer d {sq_d}")
    (n_codes,) = struct.unpack_from("<Q", buf, off)
    off += 8
    if n_codes != ntotal * code_size:
        raise ValueError(f"IndexSQ corrupt: codes {n_codes} != {ntotal}·{code_size}")
    codes = np.frombuffer(buf, dtype=np.uint8, count=n_codes, offset=off).reshape(
        ntotal, code_size
    )
    if qtype == 0:  # QT_8bit, per-dim [vmin | vdiff]
        if code_size != d or n_trained != 2 * d:
            raise ValueError("QT_8bit layout mismatch")
        vmin, vdiff = trained[:d], trained[d:]
        return (
            vmin + (codes.astype(np.float32) + 0.5) / 255.0 * vdiff
        ).astype(np.float32)
    if qtype == 2:  # QT_8bit_uniform, scalar vmin/vdiff
        if code_size != d or n_trained < 2:
            raise ValueError("QT_8bit_uniform layout mismatch")
        return (
            trained[0] + (codes.astype(np.float32) + 0.5) / 255.0 * trained[1]
        ).astype(np.float32)
    if qtype in (1, 3):  # QT_4bit / QT_4bit_uniform — Codec4bit nibbles
        if code_size != (d + 1) // 2:
            raise ValueError("QT_4bit layout mismatch")
        nibbles = np.empty((ntotal, 2 * code_size), dtype=np.uint8)
        nibbles[:, 0::2] = codes & 0x0F  # even components: low nibble
        nibbles[:, 1::2] = (codes >> 4) & 0x0F  # odd: high nibble
        q = (nibbles[:, :d].astype(np.float32) + 0.5) / 15.0
        if qtype == 1:
            if n_trained != 2 * d:
                raise ValueError("QT_4bit layout mismatch")
            vmin, vdiff = trained[:d], trained[d:]
        else:
            if n_trained < 2:
                raise ValueError("QT_4bit_uniform layout mismatch")
            vmin, vdiff = trained[0], trained[1]
        return (vmin + q * vdiff).astype(np.float32)
    if qtype == 4:  # QT_fp16
        if code_size != 2 * d:
            raise ValueError("QT_fp16 layout mismatch")
        return codes.view("<f2").reshape(ntotal, d).astype(np.float32)
    if qtype == 5:  # QT_8bit_direct
        if code_size != d:
            raise ValueError("QT_8bit_direct layout mismatch")
        return codes.astype(np.float32)
    if qtype == 6:  # QT_6bit — Codec6bit, per-dim [vmin | vdiff]
        if code_size != (d * 6 + 7) // 8 or n_trained != 2 * d:
            raise ValueError("QT_6bit layout mismatch")
        # pad each row to whole 3-byte groups, then extract component i
        # from its group per Codec6bit's little-endian layout
        groups = (d + 3) // 4
        padded = np.zeros((ntotal, groups * 3), dtype=np.uint8)
        padded[:, :code_size] = codes
        i = np.arange(d)
        b0 = padded[:, (i >> 2) * 3]
        b1 = padded[:, (i >> 2) * 3 + 1]
        b2 = padded[:, (i >> 2) * 3 + 2]
        rem = i & 3
        c6 = np.where(
            rem == 0,
            b0 & 0x3F,
            np.where(
                rem == 1,
                (b0 >> 6) | ((b1 & 0x0F) << 2),
                np.where(rem == 2, (b1 >> 4) | ((b2 & 0x03) << 4), b2 >> 2),
            ),
        )
        vmin, vdiff = trained[:d], trained[d:]
        return (vmin + (c6.astype(np.float32) + 0.5) / 63.0 * vdiff).astype(
            np.float32
        )
    if qtype == 7:  # QT_bf16 — high half of a float32
        if code_size != 2 * d:
            raise ValueError("QT_bf16 layout mismatch")
        u16 = codes.view("<u2").reshape(ntotal, d).astype(np.uint32)
        return (u16 << 16).view(np.float32)
    if qtype == 8:  # QT_8bit_direct_signed
        if code_size != d:
            raise ValueError("QT_8bit_direct_signed layout mismatch")
        return codes.astype(np.float32) - 128.0
    raise NotImplementedError(
        f"ScalarQuantizer qtype {qtype} not recognized"
    )


def parse_faiss_ivfpq_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexIVFPQ`` files — no faiss
    dependency.  Reconstruction is the same arithmetic faiss's
    ``reconstruct_n`` performs: PQ-decode each code via the codebook and,
    when ``by_residual`` is set (the default), add the list's coarse
    centroid — which is right there in the nested flat quantizer.  Layout
    (faiss/impl/index_write.cpp): fourcc "IwPQ", ivf header (index header,
    nlist, nprobe, nested IndexFlat quantizer, direct map), by_residual
    (bool), code_size (size_t), ProductQuantizer, ArrayInvertedLists whose
    codes are the packed PQ codes per vector.  Returns (ids, vectors) —
    the QUANTIZED vectors, identical to the library decode; every code
    width decodes, like ``parse_faiss_pq_index``."""
    import struct

    import numpy as np

    if bytes(buf[0:4]) != b"IwPQ":
        raise NotImplementedError(
            f"not an IndexIVFPQ file (fourcc {bytes(buf[0:4])!r})"
        )
    d, ntotal, _metric, off = _parse_index_header(buf, 4)
    (nlist,) = struct.unpack_from("<Q", buf, off)
    off += 8
    off += 8  # nprobe
    centroids, off = _parse_flat_at(buf, off)  # coarse quantizer payload
    off = _parse_direct_map(buf, off)
    by_residual = buf[off]
    off += 1
    (code_size,) = struct.unpack_from("<Q", buf, off)
    off += 8
    pq_d, M, nbits, cent, off = _parse_product_quantizer(buf, off)
    if pq_d != d:
        raise ValueError(f"IndexIVFPQ corrupt: header d {d} != quantizer d {pq_d}")
    if code_size != (M * nbits + 7) // 8:
        raise ValueError(
            f"IndexIVFPQ corrupt: code_size {code_size} != ceil({M}·{nbits}/8)"
        )
    entries, _ = _parse_inverted_lists(buf, off, nlist, code_size)
    dsub = d // M
    all_ids = []
    all_vecs = []
    for li, ids, raw in entries:
        codes = _pq_code_indices(raw, M, nbits)
        out = np.empty((codes.shape[0], d), dtype=np.float32)
        for m in range(M):
            out[:, m * dsub : (m + 1) * dsub] = cent[m, codes[:, m]]
        if by_residual:
            out += centroids[li]
        all_ids.append(ids)
        all_vecs.append(out)
    ids = np.concatenate(all_ids) if all_ids else np.empty(0, dtype=np.int64)
    vecs = np.concatenate(all_vecs) if all_vecs else np.empty((0, d), dtype=np.float32)
    if vecs.shape[0] != ntotal:
        raise ValueError(
            f"IndexIVFPQ corrupt: header ntotal {ntotal} != list payload {vecs.shape[0]}"
        )
    return ids.astype(np.int64), vecs


def parse_faiss_idmap_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexIDMap`` files wrapping a flat
    index (the standard way to ``add_with_ids`` onto IndexFlat).  Layout
    (faiss/impl/index_write.cpp): fourcc "IxMp" (or "IxM2" for IDMap2),
    index_header, nested write_index(sub-index), vector<int64> id_map.
    Returns (ids, vectors); non-flat sub-indexes raise NotImplementedError
    (IVFFlat sub-indexes are better written directly, not IDMap-wrapped —
    IVF supports add_with_ids natively)."""
    import struct

    import numpy as np

    if bytes(buf[0:4]) not in (b"IxMp", b"IxM2"):
        raise NotImplementedError(
            f"not an IndexIDMap file (fourcc {bytes(buf[0:4])!r})"
        )
    _d, ntotal, _metric, off = _parse_index_header(buf, 4)
    arr, off = _parse_flat_at(buf, off)
    (count,) = struct.unpack_from("<Q", buf, off)
    off += 8
    if count != ntotal or arr.shape[0] != ntotal:
        raise ValueError(
            f"IndexIDMap corrupt: header ntotal {ntotal}, id_map {count}, "
            f"storage {arr.shape[0]}"
        )
    ids = np.frombuffer(buf, dtype="<i8", count=count, offset=off)
    return ids.astype(np.int64), arr


# FAISS *binary* index families (``write_index_binary``, public format,
# faiss/impl/index_write.cpp): every family decodes natively below —
# IndexBinaryFlat "IBxF", IndexBinaryIVF "IBwF", IndexBinaryIDMap/IDMap2
# "IBMp"/"IBM2", IndexBinaryHNSW "IBHf" (graph skipped, flat storage
# read), IndexBinaryFromFloat "IBFf" (nested float index thresholded back
# to bits), IndexBinaryHash "IBHh" (codes concatenated out of the hash
# inverted lists) and IndexBinaryMultiHash "IBMh" (flat storage read; the
# per-hash maps are accelerator-only).  Unknown "IB…" fourccs gate with
# the IndexBinaryFlat re-export remediation.
_FAISS_BINARY_FOURCC = (
    b"IBxF", b"IBwF", b"IBMp", b"IBM2", b"IBHf", b"IBFf", b"IBHh", b"IBMh",
)


def _parse_binary_index_header(buf: bytes, off: int) -> tuple[int, int, int, int]:
    """``write_index_binary_header``: d (int32), code_size (int32), ntotal
    (int64), 2×idx_t placeholders, is_trained (1 byte), metric_type
    (int32; Hamming family — no metric_arg).  Returns (d, code_size,
    ntotal, next_off)."""
    import struct

    d, code_size = struct.unpack_from("<ii", buf, off)
    off += 8
    (ntotal,) = struct.unpack_from("<q", buf, off)
    off += 8
    off += 16  # two idx_t compat placeholders
    off += 1  # is_trained
    off += 4  # metric_type
    if code_size != (d + 7) // 8:
        raise ValueError(
            f"binary index corrupt: d={d} implies code_size {(d + 7) // 8}, "
            f"file says {code_size}"
        )
    return d, code_size, ntotal, off


def _unpack_binary_codes(codes, d: int):
    """Bit-packed binary codes → (n, d) float32 of 0.0/1.0.  FAISS stores
    dimension j at bit ``code[j >> 3] >> (j & 7)`` — LSB-first within each
    byte (faiss/utils/hamming.h), i.e. ``bitorder='little'``.  On the
    unpacked representation Hamming distance IS Manhattan/L1 distance, so
    migrated binary vectors search exactly via
    ``knn_search(metric='manhattan')``."""
    import numpy as np

    bits = np.unpackbits(np.ascontiguousarray(codes), axis=1, bitorder="little")
    return bits[:, :d].astype(np.float32)


def _parse_binary_flat_at(buf: bytes, off: int):
    """Parse one IndexBinaryFlat segment at ``off`` (top-level file or the
    nested IVF coarse quantizer): fourcc "IBxF", binary header, then
    WRITEVECTOR xb (uint64 byte count + the packed codes).  Returns
    ((ntotal, d) float32 0/1 matrix, next_off)."""
    import struct

    import numpy as np

    fourcc = bytes(buf[off : off + 4])
    if fourcc != b"IBxF":
        raise NotImplementedError(
            f"expected an IndexBinaryFlat segment, found fourcc {fourcc!r}"
        )
    off += 4
    d, code_size, ntotal, off = _parse_binary_index_header(buf, off)
    (count,) = struct.unpack_from("<Q", buf, off)
    off += 8
    if count != ntotal * code_size:
        raise ValueError(
            f"IndexBinaryFlat corrupt: header says {ntotal}×{code_size} "
            f"code bytes but payload holds {count}"
        )
    codes = np.frombuffer(buf, dtype=np.uint8, count=count, offset=off).reshape(
        ntotal, code_size
    )
    return _unpack_binary_codes(codes, d), off + count


def parse_faiss_binary_flat_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexBinaryFlat`` files ("IBxF") — no
    faiss dependency.  Byte layout (public format,
    faiss/impl/index_write.cpp ``write_index_binary``):

      uint32  fourcc "IBxF"
      int32   d                       (bits per vector)
      int32   code_size               (= ceil(d/8) bytes per vector)
      int64   ntotal
      int64   dummy ×2                (1<<20 compat placeholders)
      uint8   is_trained
      int32   metric_type             (Hamming family; no metric_arg)
      uint64  count                   number of code BYTES = ntotal·code_size
      uint8   xb[count]               packed codes, LSB-first per byte

    Returns the (ntotal, d) float32 matrix of unpacked 0.0/1.0 bits —
    Hamming distance on the codes equals Manhattan distance on the
    unpacked vectors, so downstream search uses the existing L1 kernel."""
    arr, _ = _parse_binary_flat_at(buf, 0)
    return arr


def parse_faiss_binary_ivf_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexBinaryIVF`` files ("IBwF") — no
    faiss dependency.  Layout (faiss/impl/index_write.cpp
    ``write_index_binary``): fourcc, binary header, uint64 nlist, uint64
    nprobe, nested write_index_binary(quantizer) (an IndexBinaryFlat
    segment: the nlist centroid codes), write_direct_map, then the same
    ``write_InvertedLists`` payload as float IVF (code_size is the packed
    BINARY code width; codes precede ids per list).  Returns (ids,
    vectors) — int64 stored ids (``add_with_ids`` survives migration) and
    the (ntotal, d) float32 0/1 matrix in inverted-list order."""
    import struct

    import numpy as np

    if bytes(buf[0:4]) != b"IBwF":
        raise NotImplementedError(
            f"not an IndexBinaryIVF file (fourcc {bytes(buf[0:4])!r})"
        )
    d, code_size, ntotal, off = _parse_binary_index_header(buf, 4)
    (nlist,) = struct.unpack_from("<Q", buf, off)
    off += 8
    off += 8  # nprobe (serving knob, not needed to reconstruct)
    _centroids, off = _parse_binary_flat_at(buf, off)  # coarse quantizer
    off = _parse_direct_map(buf, off)
    entries, _ = _parse_inverted_lists(buf, off, nlist, code_size)
    ids = (
        np.concatenate([e[1] for e in entries])
        if entries
        else np.empty(0, dtype=np.int64)
    )
    codes = (
        np.concatenate([e[2] for e in entries])
        if entries
        else np.empty((0, code_size), dtype=np.uint8)
    )
    if codes.shape[0] != ntotal:
        raise ValueError(
            f"IndexBinaryIVF corrupt: header ntotal {ntotal} != list "
            f"payload {codes.shape[0]}"
        )
    return ids.astype(np.int64), _unpack_binary_codes(codes, d)


def parse_faiss_binary_idmap_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexBinaryIDMap`` files ("IBMp", or
    "IBM2" for IDMap2) wrapping IndexBinaryFlat.  Layout
    (faiss/impl/index_write.cpp): fourcc, binary header, nested
    write_index_binary(sub-index), vector<int64> id_map.  Returns (ids,
    vectors) with the unpacked 0/1 representation."""
    import struct

    import numpy as np

    if bytes(buf[0:4]) not in (b"IBMp", b"IBM2"):
        raise NotImplementedError(
            f"not an IndexBinaryIDMap file (fourcc {bytes(buf[0:4])!r})"
        )
    _d, _cs, ntotal, off = _parse_binary_index_header(buf, 4)
    arr, off = _parse_binary_flat_at(buf, off)
    (count,) = struct.unpack_from("<Q", buf, off)
    off += 8
    if count != ntotal or arr.shape[0] != ntotal:
        raise ValueError(
            f"IndexBinaryIDMap corrupt: header ntotal {ntotal}, id_map "
            f"{count}, storage {arr.shape[0]}"
        )
    ids = np.frombuffer(buf, dtype="<i8", count=count, offset=off)
    return ids.astype(np.int64), arr


def parse_faiss_binary_hnsw_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexBinaryHNSW`` files ("IBHf").
    Layout (faiss/impl/index_write.cpp): fourcc, binary header,
    ``write_HNSW`` graph (the same five vectors as the float HNSW:
    assign_probas f64, cum_nneighbor_per_level i32, levels i32, offsets
    u64, neighbors i32, then a version-drifting scalar block), nested
    ``write_index_binary(storage)`` — an IndexBinaryFlat segment holding
    every code in insertion order.  The graph is a search accelerator
    only: decoding skips it and reads the flat storage, using the same
    bounded forward-scan over the scalar block as the float HNSW parser
    (a false positive is impossible — the nested fourcc, dimension, and
    count must all agree with the outer header).  Returns the (ntotal, d)
    float32 0/1 matrix."""
    import struct

    if bytes(buf[0:4]) != b"IBHf":
        raise NotImplementedError(
            f"not an IndexBinaryHNSW file (fourcc {bytes(buf[0:4])!r})"
        )
    d, _cs, ntotal, off = _parse_binary_index_header(buf, 4)
    try:
        for elem_size in (8, 4, 4, 8, 4):  # the five write_HNSW vectors
            (count,) = struct.unpack_from("<Q", buf, off)
            off += 8 + elem_size * count
    except struct.error as e:
        raise ValueError(f"IndexBinaryHNSW truncated graph section: {e}") from e
    for skip in range(0, 65, 1):  # version-drifting scalar block
        try:
            arr, _ = _parse_binary_flat_at(buf, off + skip)
        except (NotImplementedError, ValueError, struct.error):
            continue
        if arr.shape == (ntotal, d):
            return arr
    raise NotImplementedError(
        "IndexBinaryHNSW storage segment not found — unrecognized faiss "
        "serialization revision; re-export as IndexBinaryFlat or .npy"
    )


def parse_faiss_binary_fromfloat_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexBinaryFromFloat`` files
    ("IBFf"): fourcc, binary header, then a nested ``write_index`` of the
    wrapped FLOAT index.  The wrapper stores each binary vector in the
    float index in ±1 form (``binary_to_real``: bit → 2·bit − 1,
    faiss/utils/utils.cpp), so the bits come back by thresholding the
    decoded floats at 0 (``real_to_binary``'s rule — also exact for a
    lossy float sub-index, since that is precisely how faiss itself
    reconstructs through this wrapper).  Any float family the float
    dispatcher handles works as the sub-index; ids pass through (an IVF
    sub-index keeps its stored ids).  Returns (ids, (ntotal, d) float32
    0/1 matrix)."""
    import numpy as np

    if bytes(buf[0:4]) != b"IBFf":
        raise NotImplementedError(
            f"not an IndexBinaryFromFloat file (fourcc {bytes(buf[0:4])!r})"
        )
    d, _cs, ntotal, off = _parse_binary_index_header(buf, 4)
    ids, floats = _decode_faiss_bytes(bytes(buf[off:]))
    if floats.shape != (ntotal, d):
        raise ValueError(
            f"IndexBinaryFromFloat corrupt: header says {ntotal}×{d} but "
            f"the wrapped float index holds {floats.shape}"
        )
    return ids, (floats > 0).astype(np.float32)


def parse_faiss_binary_hash_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexBinaryHash`` files ("IBHh").
    Layout (faiss/impl/index_write.cpp ``write_binary_hash_invlists``):
    fourcc, binary header, b (int32, hash prefix bits), nflip (int32),
    then the inverted lists: sz (uint64 list count), il_nbit (int32),
    WRITEVECTOR bitstring (per list: key in ``b`` bits + size in
    ``il_nbit`` bits, LSB-first — sizes are a cross-check only; the
    authoritative counts are the per-list vectors), then per list
    WRITEVECTOR ids (int64) + WRITEVECTOR vecs (packed codes).  The codes
    live IN the lists (no separate storage), so decoding concatenates
    every list.  Returns (ids, vectors) in list order — ``add`` ids are
    sequential, so order is recoverable by sorting on id downstream."""
    import struct

    import numpy as np

    if bytes(buf[0:4]) != b"IBHh":
        raise NotImplementedError(
            f"not an IndexBinaryHash file (fourcc {bytes(buf[0:4])!r})"
        )
    _d, code_size, ntotal, off = _parse_binary_index_header(buf, 4)
    off += 8  # b (int32) + nflip (int32)
    sz, = struct.unpack_from("<Q", buf, off)
    off += 8
    off += 4  # il_nbit
    (bitstring_bytes,) = struct.unpack_from("<Q", buf, off)
    off += 8 + bitstring_bytes  # keys/sizes bitstring: accelerator-only
    all_ids, all_codes = [], []
    for _ in range(sz):
        (n_ids,) = struct.unpack_from("<Q", buf, off)
        off += 8
        all_ids.append(np.frombuffer(buf, dtype="<i8", count=n_ids, offset=off))
        off += 8 * n_ids
        (n_code_bytes,) = struct.unpack_from("<Q", buf, off)
        off += 8
        if n_code_bytes != n_ids * code_size:
            raise ValueError(
                f"IndexBinaryHash corrupt: list holds {n_ids} ids but "
                f"{n_code_bytes} code bytes (code_size {code_size})"
            )
        all_codes.append(
            np.frombuffer(buf, dtype=np.uint8, count=n_code_bytes, offset=off).reshape(
                n_ids, code_size
            )
        )
        off += n_code_bytes
    ids = (
        np.concatenate(all_ids) if all_ids else np.empty(0, dtype=np.int64)
    )
    codes = (
        np.concatenate(all_codes)
        if all_codes
        else np.empty((0, code_size), dtype=np.uint8)
    )
    if codes.shape[0] != ntotal:
        raise ValueError(
            f"IndexBinaryHash corrupt: header ntotal {ntotal} != list "
            f"payload {codes.shape[0]}"
        )
    return ids.astype(np.int64), _unpack_binary_codes(codes, _d)


def parse_faiss_binary_multihash_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexBinaryMultiHash`` files
    ("IBMh").  Layout (faiss/impl/index_write.cpp): fourcc, binary
    header, nested ``write_index_binary(storage)`` — an IndexBinaryFlat
    segment holding every code in id order — then b (int32), nhash
    (int32), nflip (int32) and ``nhash`` hash maps (each: id_bits int32,
    sz uint64, WRITEVECTOR bitstring of key/size/id entries).  Unlike
    IndexBinaryHash, the codes live in the flat storage and the maps hold
    only row references, so the storage alone reconstructs the collection
    exactly.  Returns the (ntotal, d) float32 0/1 matrix (ids are
    positional — this family has no add_with_ids)."""
    if bytes(buf[0:4]) != b"IBMh":
        raise NotImplementedError(
            f"not an IndexBinaryMultiHash file (fourcc {bytes(buf[0:4])!r})"
        )
    d, _cs, ntotal, off = _parse_binary_index_header(buf, 4)
    arr, off = _parse_binary_flat_at(buf, off)
    if arr.shape != (ntotal, d):
        raise ValueError(
            f"IndexBinaryMultiHash corrupt: header says {ntotal}×{d} but "
            f"storage holds {arr.shape}"
        )
    return arr


def _decode_faiss_binary_bytes(buf: bytes):
    """Dispatch a binary-index file (fourcc "IB…") by family — every
    public ``write_index_binary`` family decodes natively; unknown "IB…"
    fourccs gate with the re-export remediation.  Returns (ids, unpacked
    0/1 float32 vectors); Hamming on the codes ≡ L1 on the vectors."""
    import numpy as np

    fourcc = bytes(buf[0:4])
    if fourcc == b"IBxF":
        arr = parse_faiss_binary_flat_index(buf)
        return np.arange(arr.shape[0], dtype=np.int64), arr
    if fourcc == b"IBwF":
        return parse_faiss_binary_ivf_index(buf)
    if fourcc in (b"IBMp", b"IBM2"):
        return parse_faiss_binary_idmap_index(buf)
    if fourcc == b"IBHf":
        arr = parse_faiss_binary_hnsw_index(buf)
        return np.arange(arr.shape[0], dtype=np.int64), arr
    if fourcc == b"IBFf":
        return parse_faiss_binary_fromfloat_index(buf)
    if fourcc == b"IBHh":
        return parse_faiss_binary_hash_index(buf)
    if fourcc == b"IBMh":
        arr = parse_faiss_binary_multihash_index(buf)
        return np.arange(arr.shape[0], dtype=np.int64), arr
    raise NotImplementedError(
        f"FAISS binary index fourcc {fourcc!r} not decodable without faiss "
        "(IndexBinaryFlat/IVF/IDMap/HNSW/FromFloat/Hash/MultiHash decode "
        "natively); re-export as IndexBinaryFlat — "
        "``faiss.IndexBinaryFlat(d)`` + add of the reconstructed codes is "
        "lossless — or as .npy"
    )


def _parse_vector_transform(buf: bytes, off: int):
    """Parse one serialized ``VectorTransform`` (public byte layout,
    faiss/impl/index_read.cpp ``read_VectorTransform``): a subtype fourcc,
    subtype-specific fields, then the common trailer d_in (int32), d_out
    (int32), is_trained (1 byte).

    Subtypes decoded:
      * linear family — ``LTra`` (generic LinearTransform, which is how
        faiss serializes **OPQMatrix**: write_VectorTransform has no OPQ
        case, so OPQ hits the generic branch), ``rrot``
        (RandomRotationMatrix), and the PCAMatrix spellings ``PCAm``
        (legacy: eigen_power f32 + random_rotation u8 before the moment
        vectors) / ``Pcam``/``PcAm`` (current: + epsilon f32 +
        balanced_bins u8).  All share the trailer have_bias (u8) +
        A (float vector, d_out×d_in row-major) + b (float vector).
      * ``RmDT`` RemapDimensionsTransform — int32 ``map`` vector.
      * ``VNrm`` NormalizationTransform — norm (f32); reverse = identity.
      * ``VCnt`` CenteringTransform — float ``mean`` vector.
    Anything else (ITQ etc.) raises NotImplementedError with the
    re-export remediation.  Returns (transform dict, next_off)."""
    import struct

    import numpy as np

    def _vec(dtype, o):
        (cnt,) = struct.unpack_from("<Q", buf, o)
        o += 8
        v = np.frombuffer(buf, dtype=dtype, count=cnt, offset=o)
        return v, o + cnt * v.itemsize

    fourcc = bytes(buf[off : off + 4])
    off += 4
    t: dict = {"fourcc": fourcc}
    if fourcc in (b"LTra", b"rrot", b"PCAm", b"Pcam", b"PcAm"):
        if fourcc != b"LTra" and fourcc != b"rrot":  # PCAMatrix variants
            off += 4  # eigen_power (f32)
            if fourcc != b"PCAm":
                off += 4  # epsilon (f32, current writer only)
            off += 1  # random_rotation (u8)
            if fourcc != b"PCAm":
                off += 1  # balanced_bins (u8)
            _, off = _vec("<f4", off)  # mean (training artifact)
            _, off = _vec("<f4", off)  # eigenvalues
            _, off = _vec("<f4", off)  # PCAMat (pre-rotation basis)
        t["kind"] = "linear"
        t["have_bias"] = buf[off] != 0
        off += 1
        t["A"], off = _vec("<f4", off)
        t["b"], off = _vec("<f4", off)
    elif fourcc == b"RmDT":
        t["kind"] = "remap"
        t["map"], off = _vec("<i4", off)
    elif fourcc == b"VNrm":
        t["kind"] = "norm"  # reverse_transform is identity in faiss
        off += 4  # norm (f32)
    elif fourcc == b"VCnt":
        t["kind"] = "center"
        t["mean"], off = _vec("<f4", off)
    else:
        raise NotImplementedError(
            f"unsupported VectorTransform fourcc {fourcc!r} inside an "
            "IndexPreTransform file: linear (OPQ/LTra/rrot/PCA), remap, "
            "normalization, and centering transforms decode natively; "
            "re-export as .npy or IndexFlat for anything else"
        )
    (t["d_in"],) = struct.unpack_from("<i", buf, off)
    (t["d_out"],) = struct.unpack_from("<i", buf, off + 4)
    off += 9  # d_in, d_out, is_trained
    return t, off


def _reverse_transform(t: dict, Y):
    """Apply one transform's ``reverse_transform`` to the (n, d_out)
    matrix ``Y``, mirroring faiss semantics: linear requires an
    orthonormal A (faiss's LinearTransform::reverse_transform throws
    otherwise — checked here the same way, A·Aᵀ ≈ I) and computes
    x = Aᵀ(y − b); remap scatters back to mapped input slots;
    normalization is irreversible so faiss reverses it as identity;
    centering adds the mean back."""
    import numpy as np

    if t["kind"] == "linear":
        d_in, d_out = t["d_in"], t["d_out"]
        A = t["A"].reshape(d_out, d_in).astype(np.float64)
        if not np.allclose(A @ A.T, np.eye(d_out), atol=1e-3):
            raise NotImplementedError(
                "IndexPreTransform linear transform is not orthonormal: "
                "reverse_transform is undefined (faiss throws too); "
                "re-export as .npy or IndexFlat"
            )
        Y = Y.astype(np.float64)
        if t["have_bias"] and t["b"].size:
            Y = Y - t["b"].astype(np.float64)
        return (Y @ A).astype(np.float32)
    if t["kind"] == "remap":
        n = Y.shape[0]
        X = np.zeros((n, t["d_in"]), dtype=np.float32)
        m = t["map"]
        keep = m >= 0
        X[:, m[keep]] = Y[:, np.nonzero(keep)[0]]
        return X
    if t["kind"] == "center":
        return (Y + t["mean"]).astype(np.float32)
    return Y  # norm: identity reverse


def parse_faiss_pretransform_index(buf: bytes):
    """Pure-NumPy reader for FAISS ``IndexPreTransform`` files (OPQ- or
    PCA-wrapped indexes, e.g. ``index_factory(d, "OPQ16,IVF64,PQ16")``) —
    no faiss dependency.  Layout (faiss/impl/index_write.cpp): fourcc
    "IxPT", index_header (d = ORIGINAL input dim), int32 chain length,
    that many ``write_VectorTransform`` records, then the wrapped index
    serialized recursively.  Reconstruction matches the reference's
    ``faiss.read_index`` + ``reconstruct_n``
    (scripts/migrate_from_faiss.py:68-77): decode the inner index's
    vectors (transformed space), then apply each chain transform's
    reverse in reverse chain order, yielding original-space vectors.
    Returns (row_idx, vectors) — ids pass through from id-carrying inner
    indexes (IVF*, IDMap)."""
    import struct

    import numpy as np

    if bytes(buf[0:4]) != b"IxPT":
        raise NotImplementedError(
            f"not an IndexPreTransform file (fourcc {bytes(buf[0:4])!r})"
        )
    d_in, ntotal, _metric, off = _parse_index_header(buf, 4)
    (nt,) = struct.unpack_from("<i", buf, off)
    off += 4
    chain = []
    for _ in range(nt):
        t, off = _parse_vector_transform(buf, off)
        chain.append(t)
    idx, arr = _decode_faiss_bytes(buf[off:])
    if arr.shape[0] != ntotal:
        raise ValueError(
            f"IndexPreTransform corrupt: header ntotal {ntotal}, inner "
            f"index holds {arr.shape[0]}"
        )
    for t in reversed(chain):
        arr = _reverse_transform(t, np.asarray(arr))
    if arr.shape[1] != d_in:
        raise ValueError(
            f"IndexPreTransform chain reversed to dim {arr.shape[1]}, "
            f"header says d={d_in}"
        )
    return idx, arr


def read_faiss_vectors(spark: SparkSession, path: str) -> DataFrame:
    """FAISS-index branch of S4 (migrate_from_faiss.py:68-77:
    ``faiss.read_index`` + ``reconstruct_n``) — same distributed shape as
    read_npy_vectors (binaryFile scan → per-file decode in mapInPandas).
    ``IndexFlat*`` files decode with the pure-NumPy parser above (no faiss
    needed — flat storage IS the raw float32 matrix); other index types
    fall back to faiss when installed, else NotImplementedError."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.index")
        .load(path)
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                idx, arr = _decode_faiss_bytes(bytes(content))
                yield pd.DataFrame(
                    {
                        "src_file": fpath,
                        "row_idx": idx,
                        "embedding": list(arr.astype(np.float64)),
                    }
                )

    return files.select("path", "content").mapInPandas(parse, NPY_ROW_SCHEMA)


def _decode_faiss_bytes(buf: bytes):
    """Dispatch one index file to its pure-NumPy decoder by fourcc; fall
    back to the real faiss library for types whose codes need a decoder.
    Returns (row_idx int64 ndarray, vectors float32 ndarray).  row_idx is
    the STORED id per vector where the format records ids (IVFFlat, IDMap
    — add_with_ids ids survive the migration exactly), else sequential
    0..ntotal-1, matching reconstruct_n order."""
    import numpy as np

    fourcc = bytes(buf[0:4])
    if fourcc in _FAISS_BINARY_FOURCC:
        # binary families: unpacked 0/1 float vectors, Hamming ≡ L1
        return _decode_faiss_binary_bytes(buf)
    # id-carrying formats (IVF*, IDMap) must yield STORED ids from the
    # library fallback too — a positional arange would silently remap
    # add_with_ids ids depending on which decode path ran
    if fourcc == _FAISS_IVFFLAT_FOURCC:
        try:
            return parse_faiss_ivfflat_index(buf)
        except NotImplementedError:
            return _reconstruct_with_faiss(buf, want_ids=True)
    elif fourcc == b"IHNf":
        try:
            arr = parse_faiss_hnswflat_index(buf)
        except NotImplementedError:
            arr = _reconstruct_with_faiss(buf)
    elif fourcc in (b"IxMp", b"IxM2"):
        try:
            return parse_faiss_idmap_index(buf)
        except NotImplementedError:
            return _reconstruct_with_faiss(buf, want_ids=True)
    elif fourcc == b"IxPq":
        try:
            arr = parse_faiss_pq_index(buf)
        except NotImplementedError:
            arr = _reconstruct_with_faiss(buf)
    elif fourcc == b"IwPQ":
        try:
            return parse_faiss_ivfpq_index(buf)
        except NotImplementedError:
            return _reconstruct_with_faiss(buf, want_ids=True)
    elif fourcc == b"IxSQ":
        try:
            arr = parse_faiss_sq_index(buf)
        except NotImplementedError:
            arr = _reconstruct_with_faiss(buf)
    elif fourcc == b"IxPT":
        try:
            return parse_faiss_pretransform_index(buf)
        except NotImplementedError:
            # top-level reconstruct_n applies the chain's reverse transform
            # (the IVF id-recovery path would yield TRANSFORMED-space
            # vectors); ids are positional, exactly the reference's
            # reconstruct_n semantics (migrate_from_faiss.py:68-77)
            arr = _reconstruct_with_faiss(buf)
    else:
        try:
            arr = parse_faiss_flat_index(buf)
        except NotImplementedError:
            arr = _reconstruct_with_faiss(buf)  # quantized types need faiss
    return np.arange(arr.shape[0], dtype=np.int64), arr


def _reconstruct_with_faiss(buf: bytes, want_ids: bool = False):  # pragma: no cover - faiss absent
    """Graph/quantized indexes need the real library to decode.

    ``want_ids=True`` (id-carrying formats: IVF*, IDMap) additionally
    recovers the STORED ids — from ``id_map`` for IDMap wrappers, from the
    inverted lists for IVF indexes — so the fallback agrees with the native
    parsers; if ids cannot be recovered it raises rather than returning
    positional indices that could collide in metadata joins."""
    try:
        import faiss  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "FAISS index type not decodable without faiss (flat, IVFFlat, "
            "HNSWFlat, IDMap-flat, PQ/IVFPQ at every code width, every "
            "serialized ScalarQuantizer type, and orthonormal-linear/"
            "remap/centering PreTransform wrappers — incl. OPQ — decode "
            "natively); re-export as .npy or IndexFlat — the reference's "
            "own fallback"
        ) from e
    import os
    import tempfile

    import numpy as np

    with tempfile.NamedTemporaryFile(suffix=".index", delete=False) as tmp:
        tmp.write(buf)
        name = tmp.name
    try:
        index = faiss.read_index(name)
        if not want_ids:
            return index.reconstruct_n(0, index.ntotal)
        if isinstance(index, (faiss.IndexIDMap, faiss.IndexIDMap2)):
            # base index stores vectors positionally; id_map is in the
            # same insertion order
            ids = faiss.vector_to_array(index.id_map).astype(np.int64)
            return ids, index.index.reconstruct_n(0, index.ntotal)
        try:
            ivf = faiss.extract_index_ivf(index)
        except Exception:
            ivf = None
        if ivf is not None:
            # inverted-list order, matching the native IVF parsers
            ids_out: list = []
            vec_out: list = []
            for li in range(ivf.nlist):
                sz = ivf.invlists.list_size(li)
                if sz == 0:
                    continue
                list_ids = faiss.rev_swig_ptr(ivf.invlists.get_ids(li), sz)
                ids_out.append(np.array(list_ids, dtype=np.int64))
                vec_out.append(
                    np.stack(
                        [ivf.reconstruct_from_offset(li, o) for o in range(sz)]
                    ).astype(np.float32)
                )
            ids = (
                np.concatenate(ids_out) if ids_out else np.empty(0, np.int64)
            )
            vecs = (
                np.concatenate(vec_out)
                if vec_out
                else np.empty((0, index.d), np.float32)
            )
            return ids, vecs
        raise NotImplementedError(
            "stored ids not recoverable via faiss for this index type; "
            "re-export with explicit ids (.npy + metadata)"
        )
    finally:
        os.unlink(name)


def _normalize_meta(df: DataFrame, *, idx_col) -> DataFrame:
    """Project an inferred-schema metadata frame to the engine shape
    (row_idx, user_id, metadata map<string,string>): ``user_id`` promoted if
    present, every other field stringified into the open payload map — the
    payload-merge semantics of qdrant_client.py:209-213."""
    fields = [f.name for f in df.schema.fields if f.name not in ("row_idx", "_idx")]
    user = (
        F.col("user_id").cast("string")
        if "user_id" in fields
        else F.lit(None).cast("string")
    )
    meta_fields = [n for n in fields if n != "user_id"]
    if meta_fields:
        # key literal single-quote-escaped, column reference backtick-quoted:
        # metadata keys are arbitrary JSON field names ("created-at",
        # "a'b"), not guaranteed to be valid SQL identifiers
        def _key(n: str) -> str:
            return "'" + n.replace("\\", "\\\\").replace("'", "\\'") + "'"

        def _ref(n: str) -> str:
            return "`" + n.replace("`", "``") + "`"

        meta = F.expr(
            "map_filter(map({}), (k, v) -> v IS NOT NULL)".format(
                ", ".join(
                    f"{_key(n)}, CAST({_ref(n)} AS STRING)" for n in meta_fields
                )
            )
        )
    else:
        meta = F.create_map().cast("map<string,string>")
    return df.select(
        idx_col.cast("bigint").alias("row_idx"),
        F.coalesce(user, F.concat(F.lit("migrated_user_"), idx_col.cast("string"))).alias(
            "user_id"
        ),
        meta.alias("metadata"),
    )


def read_vector_metadata(spark: SparkSession, path: str) -> DataFrame:
    """Metadata reader — DISTRIBUTED in all three accepted shapes, no
    driver-side full-file load (the reference json.load()s the whole file,
    migrate_from_faiss.py:80-101 — an assumption that breaks at 100 TB-scale
    migrations):

    - ``*.jsonl`` — line-delimited, splittable, THE scale shape; an explicit
      ``row_idx`` field aligns each record (position in a distributed text
      file is not meaningful).
    - list-form JSON (the reference's primary shape) — ``spark.read.json``
      multiLine; one element per row.  A multiLine file is one non-splittable
      task, so within-file order is the parse order and the element position
      becomes ``row_idx`` — same caveat as a mega ``.npy``: re-shard (JSONL)
      for true scale.
    - dict-keyed JSON (``{"0": {...}}``) — wholetext read + ``from_json`` to
      a map, exploded; keys carry the index, one executor task parses.

    Returns (row_idx, user_id, metadata map<string,string>).
    """
    if path.endswith(".jsonl"):
        df = spark.read.json(path)
        if "row_idx" not in df.columns:
            raise ValueError("JSONL metadata must carry an explicit row_idx field")
        return _normalize_meta(df, idx_col=F.col("row_idx"))

    head = open(path).read(64).lstrip()[:1]
    if head == "[":
        df = spark.read.option("multiLine", "true").json(path)
        if df.rdd.getNumPartitions() > 1:
            raise ValueError(
                "list-form metadata must be a single file (position-aligned); "
                "use JSONL with row_idx for sharded metadata"
            )
        # single non-splittable task → monotonically_increasing_id is the
        # 0-based element position
        df = df.withColumn("_idx", F.monotonically_increasing_id())
        return _normalize_meta(df, idx_col=F.col("_idx"))

    # dict-keyed: parse on an executor, explode the map
    whole = spark.read.text(path, wholetext=True)
    entries = whole.select(
        F.explode(
            F.from_json(F.col("value"), "map<string, map<string,string>>")
        ).alias("k", "m")
    )
    norm = entries.select(
        F.col("k").cast("bigint").alias("row_idx"),
        F.coalesce(
            F.element_at("m", "user_id"),
            F.concat(F.lit("migrated_user_"), F.col("k")),
        ).alias("user_id"),
        F.expr("map_filter(m, (k2, v) -> k2 <> 'user_id' AND v IS NOT NULL)").alias(
            "metadata"
        ),
    )
    return norm


def run_migration(
    spark: SparkSession,
    vectors_path: str,
    metadata_path: str | None,
    store_root: str,
    *,
    verify_samples: int = 8,
):
    """S5: bulk-load vectors (+ metadata) into a VectorStore, then run the
    reference's verification search on a sample (migrate_from_faiss.py:257-321:
    each sampled vector must retrieve ≥1 result — itself, since vectors are
    normalized at write).

    One distributed write job replaces the reference's client-side batch loop
    (:153-255); Spark partitioning is the batching.  Returns (store, report).
    """
    from pyspark.sql import Window

    from ..operators.search import knn_search
    from ..operators.store import VectorStore

    vecs = read_npy_vectors(spark, vectors_path)
    # Multi-shard alignment: row_idx is FILE-relative, so joining metadata
    # on it alone would fan out (each metadata row matching one row per
    # shard) and collide point_ids.  A deterministic global offset per file
    # — shards ordered by name, prefix-summed counts — makes ``global_idx``
    # the metadata key and the point id.  The offsets frame is one row per
    # shard (bounded), computed with a single ordered window.
    counts = read_npy_shard_counts(spark, vectors_path)  # header-only pass
    w = Window.orderBy("src_file").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "src_file", F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("offset")
    )
    gvecs = vecs.join(F.broadcast(offsets), "src_file").select(
        (F.col("offset") + F.col("row_idx")).alias("global_idx"), "embedding"
    )
    if metadata_path is not None:
        meta = read_vector_metadata(spark, metadata_path)
        # Align by position and truncate to the common length, as the
        # reference does (migrate_from_faiss.py:105-109) — inner join IS the
        # truncation.
        batch = gvecs.join(
            meta, gvecs.global_idx == meta.row_idx
        ).select(
            F.col("global_idx").cast("string").alias("point_id"),
            "embedding",
            "user_id",
            "metadata",
        )
    else:
        batch = gvecs.select(
            F.col("global_idx").cast("string").alias("point_id"),
            "embedding",
            F.concat(F.lit("migrated_user_"), F.col("global_idx")).alias("user_id"),
        )
    store = VectorStore.create(spark, store_root)
    n_migrated = store.add_batch(batch)

    corpus = store.read().select(
        F.col("point_id").alias("vec_id"), "embedding"
    )
    probes = corpus.limit(verify_samples).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    hits = knn_search(corpus, probes, k=1, corpus_id="vec_id").collect()
    report = {
        "n_migrated": n_migrated,
        "verify_samples": verify_samples,
        "verify_hits": len(hits),
        "verify_success": len(hits) >= min(verify_samples, n_migrated),
    }
    return store, report
