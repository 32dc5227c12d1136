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

from .quantized import QuantizedMatrix, dequantize_device


class SnpBlockStreamer:
    """Iterate (start, stop, device_block) with one-block prefetch.

    ``X`` is any (n, p) array-like supporting column slicing (ndarray,
    memmap, or a lazy reader); blocks are padded to the static block size.
    """

    def __init__(self, X, block: int, dtype=np.float32,
                 device: Optional[jax.Device] = None):
        self.X = X
        self.block = block
        self.dtype = dtype
        self.device = device or jax.devices()[0]
        self.p = X.shape[1]

    def _fetch(self, start: int):
        stop = min(start + self.block, self.p)
        pad = self.block - (stop - start)
        if isinstance(self.X, QuantizedMatrix):
            # ship int8 codes + tiny (B,) affine vectors; dequantize on
            # device (4x less tunnel traffic than float32 blocks)
            g, mu, sd = self.X.quant_block(start, stop)
            if pad:
                g = np.pad(g, ((0, 0), (0, pad)))
                mu = np.pad(mu, (0, pad))
                sd = np.pad(sd, (0, pad), constant_values=1.0)
            xb = dequantize_device(
                jax.device_put(g, self.device),
                jax.device_put(mu, self.device),
                jax.device_put(sd, self.device),
                missing_code=self.X.missing_code,
            )
            return start, stop, xb
        xb = np.asarray(self.X[:, start:stop], dtype=self.dtype)
        if pad:
            xb = np.pad(xb, ((0, 0), (0, pad)))
        return start, stop, jax.device_put(xb, self.device)

    def __iter__(self) -> Iterator[Tuple[int, int, jax.Array]]:
        starts = list(range(0, self.p, self.block))
        if not starts:
            return
        with cf.ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(self._fetch, starts[0])
            for nxt in starts[1:]:
                cur = fut.result()
                fut = pool.submit(self._fetch, nxt)
                yield cur
            yield fut.result()
