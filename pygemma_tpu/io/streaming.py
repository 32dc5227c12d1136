"""Double-buffered host->device SNP-block streaming.

The reference's analogue is its multiprocessing column-block iterator
(lmm/lmm.py:427-436); on TPU the goal is different: overlap the host-side
slice/pad/transfer of block b+1 with device compute on block b so the
association scan never stalls on PCIe (SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

from .packed import PackedMatrix, dequantize_packed_device
from .quantized import QuantizedMatrix, dequantize_device

# --- device-resident packed-block cache -----------------------------------
# Keyed by (PackedMatrix.cache_token, start, stop): holds the PACKED uint8
# device arrays (plus mu/sd), 16x smaller than float32, so repeated scans
# against the same cohort (multi-phenotype studies, warm benchmark passes,
# resumed runs) skip the host->device tunnel entirely -- at 50k x 100k that
# is 1.33 GB ~ 24 s per avoided pass on the ~50 MB/s tunnel.  Budget via
# PYGEMMA_TPU_GENO_DEV_CACHE_MB (0 = off, the default: HBM belongs to the
# scan unless the user opts in).  Insertion stops at the budget; no
# eviction churn (cohort blocks are re-touched every pass, LRU would evict
# exactly what is about to be reused).
_DEV_BLOCK_CACHE: dict = {}
_DEV_BLOCK_CACHE_BYTES = [0]


def _cache_budget_bytes() -> int:
    import os

    try:
        return int(float(os.environ.get(
            "PYGEMMA_TPU_GENO_DEV_CACHE_MB", "0")) * 2**20)
    except ValueError:
        return 0


def clear_device_block_cache() -> None:
    _DEV_BLOCK_CACHE.clear()
    _DEV_BLOCK_CACHE_BYTES[0] = 0


def prefill_device_cache(X, block: int, stop=None) -> int:
    """Ship a PackedMatrix's 2-bit blocks into the device cache WITHOUT
    dequantizing (puts only -- no device compute contended).

    Called from a background thread by the driver so the genotype
    transfer rides the otherwise-idle host->device link WHILE the kinship
    eigendecomposition runs on the chip: at 20k x 100k that overlaps the
    whole ~7 s tunnel cost of the scan with the ~27 s eigh.  Safe to race
    with the consuming scan: both sides compute identical cache entries,
    and a missed key just falls back to the scan's own transfer.
    ``stop``: optional threading.Event to abandon leftover work.
    Returns the number of blocks shipped."""
    budget = _cache_budget_bytes()
    if budget <= 0 or getattr(X, "cache_token", None) is None:
        return 0
    n_put = 0
    p = X.shape[1]
    for start in range(0, p, block):
        if stop is not None and stop.is_set():
            break
        stop_col = min(start + block, p)
        key = (X.cache_token, start, stop_col, block)
        if key in _DEV_BLOCK_CACHE:
            continue
        g, mu, sd = X.quant_block(start, stop_col)
        pad = block - (stop_col - start)
        if pad:
            g = np.pad(g, ((0, 0), (0, pad)))
            mu = np.pad(mu, (0, pad))
            sd = np.pad(sd, (0, pad), constant_values=1.0)
        nbytes = g.nbytes + mu.nbytes + sd.nbytes
        if _DEV_BLOCK_CACHE_BYTES[0] + nbytes > budget:
            break
        _DEV_BLOCK_CACHE[key] = (jax.device_put(g), jax.device_put(mu),
                                 jax.device_put(sd))
        _DEV_BLOCK_CACHE_BYTES[0] += nbytes
        n_put += 1
    return n_put


class SnpBlockStreamer:
    """Iterate (start, stop, device_block) with one-block prefetch.

    ``X`` is any (n, p) array-like supporting column slicing (ndarray,
    memmap, or a lazy reader); blocks are padded to the static block size.

    ``shardings`` places blocks on a device MESH instead of a single
    device: a ``(block_sharding, vec_sharding)`` pair for the (n, B) block
    (typically ``P(None, "snp")``) and the (B,) per-column affine vectors
    (``P("snp")``).  Quantized/packed codes are device_put under the block
    sharding and dequantized in place, so multi-chip scans keep the
    double-buffered int8/2-bit transfer path (each host ships only its
    addressable shard bytes).
    """

    def __init__(self, X, block: int, dtype=np.float32,
                 device: Optional[jax.Device] = None,
                 shardings: Optional[Tuple] = None,
                 depth: Optional[int] = None):
        self.X = X
        self.block = block
        self.dtype = dtype
        # local_devices, not devices: under jax.distributed, devices()[0]
        # is process 0's device -- putting host data on it from another
        # process crashes (observed SIGSEGV in the 2-process driver test)
        self.device = device or jax.local_devices()[0]
        self.shardings = shardings
        self.p = X.shape[1]
        # prefetch depth: how many blocks are sliced/shipped ahead of the
        # consumer.  2 keeps the link busy even when the consumer stalls a
        # beat on dispatch; device_put is async so deeper pipelines mostly
        # add host RAM, not speed.  Env override for measurements.
        import os

        self.depth = max(1, int(
            depth if depth is not None
            else os.environ.get("PYGEMMA_TPU_PREFETCH", "2")))
        self._spans_processes = False
        if shardings is not None:
            me = jax.process_index()
            self._spans_processes = any(
                d.process_index != me for d in shardings[0].device_set)

    def _put(self, arr, vec: bool = False):
        if self.shardings is not None:
            sh = self.shardings[1 if vec else 0]
            if self._spans_processes:
                # multi-host mesh: device_put cannot target non-addressable
                # devices; the callback hands each process exactly its
                # addressable column shards of the (replicated-on-host)
                # block -- only local shard bytes cross the host link
                a = np.asarray(arr)
                return jax.make_array_from_callback(
                    a.shape, sh, lambda idx: a[idx])
            return jax.device_put(arr, sh)
        return jax.device_put(arr, self.device)

    def _fetch(self, start: int):
        stop = min(start + self.block, self.p)
        pad = self.block - (stop - start)
        if isinstance(self.X, PackedMatrix):
            # ship 2-bit packed bytes (16x less tunnel traffic than
            # float32); unpack + dequantize on device.  A cache hit skips
            # the host slice AND the transfer (packed device arrays are
            # kept, not the 16x-larger dequantized floats).
            key = None
            if (self.X.cache_token is not None and self.shardings is None
                    and _cache_budget_bytes() > 0):
                key = (self.X.cache_token, start, stop, self.block)
                ent = _DEV_BLOCK_CACHE.get(key)
                if ent is not None:
                    gd, mud, sdd = ent
                    xb = dequantize_packed_device(
                        gd, mud, sdd, n=self.X.n, coding=self.X.coding)
                    return start, stop, xb
            g, mu, sd = self.X.quant_block(start, stop)
            if pad:
                g = np.pad(g, ((0, 0), (0, pad)))
                mu = np.pad(mu, (0, pad))
                sd = np.pad(sd, (0, pad), constant_values=1.0)
            gd = self._put(g)
            mud = self._put(mu, vec=True)
            sdd = self._put(sd, vec=True)
            if key is not None and key not in _DEV_BLOCK_CACHE:
                # recheck before inserting: a concurrent prefill thread may
                # have stored this key after the lookup above, and a
                # double insert double-counts the byte budget (measured: a
                # half-covered cache that silently re-streams the rest)
                nbytes = g.nbytes + mu.nbytes + sd.nbytes
                if _DEV_BLOCK_CACHE_BYTES[0] + nbytes <= _cache_budget_bytes():
                    _DEV_BLOCK_CACHE[key] = (gd, mud, sdd)
                    _DEV_BLOCK_CACHE_BYTES[0] += nbytes
            xb = dequantize_packed_device(
                gd, mud, sdd, n=self.X.n, coding=self.X.coding,
            )
            return start, stop, xb
        if isinstance(self.X, QuantizedMatrix):
            # ship int8 codes + tiny (B,) affine vectors; dequantize on
            # device (4x less tunnel traffic than float32 blocks)
            g, mu, sd = self.X.quant_block(start, stop)
            if pad:
                g = np.pad(g, ((0, 0), (0, pad)))
                mu = np.pad(mu, (0, pad))
                sd = np.pad(sd, (0, pad), constant_values=1.0)
            xb = dequantize_device(
                self._put(g), self._put(mu, vec=True),
                self._put(sd, vec=True),
                missing_code=self.X.missing_code,
            )
            return start, stop, xb
        xb = np.asarray(self.X[:, start:stop], dtype=self.dtype)
        if pad:
            xb = np.pad(xb, ((0, 0), (0, pad)))
        return start, stop, self._put(xb)

    def __iter__(self) -> Iterator[Tuple[int, int, jax.Array]]:
        starts = list(range(0, self.p, self.block))
        if not starts:
            return
        from collections import deque

        # one worker thread keeps host slicing/packing serial (it is
        # memmap-read bound); up to ``depth`` transfers ride the link ahead
        # of the consumer
        with cf.ThreadPoolExecutor(max_workers=1) as pool:
            pending = deque()
            it = iter(starts)
            for s in it:
                pending.append(pool.submit(self._fetch, s))
                if len(pending) >= self.depth:
                    break
            for nxt in it:
                cur = pending.popleft().result()
                pending.append(pool.submit(self._fetch, nxt))
                yield cur
            while pending:
                yield pending.popleft().result()
