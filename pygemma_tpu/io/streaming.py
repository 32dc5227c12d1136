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
        self.device = device or jax.devices()[0]
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

    def _put(self, arr, vec: bool = False):
        if self.shardings is not None:
            return jax.device_put(arr, self.shardings[1 if vec else 0])
        return jax.device_put(arr, self.device)

    def _fetch(self, start: int):
        stop = min(start + self.block, self.p)
        pad = self.block - (stop - start)
        if isinstance(self.X, PackedMatrix):
            # ship 2-bit packed bytes (16x less tunnel traffic than
            # float32); unpack + dequantize on device
            g, mu, sd = self.X.quant_block(start, stop)
            if pad:
                g = np.pad(g, ((0, 0), (0, pad)))
                mu = np.pad(mu, (0, pad))
                sd = np.pad(sd, (0, pad), constant_values=1.0)
            xb = dequantize_packed_device(
                self._put(g), self._put(mu, vec=True),
                self._put(sd, vec=True),
                n=self.X.n, coding=self.X.coding,
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
