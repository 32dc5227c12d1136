"""IO round-trips, preprocessing, plotting smoke, checkpoint/resume."""

import os

import numpy as np
import pytest

from pygemma_tpu import preprocess as pp
from pygemma_tpu.io import bimbam, plink, rawbin, traw
from pygemma_tpu.io.kinship import kinship_blocked
from pygemma_tpu.io.streaming import SnpBlockStreamer
from pygemma_tpu.native import bed_native
from pygemma_tpu.utils.checkpoint import RunCheckpoint


def _dosages(rng, n, p, miss=0.05):
    X = rng.integers(0, 3, size=(n, p)).astype(np.float32)
    mask = rng.random((n, p)) < miss
    X[mask] = np.nan
    return X


def test_bimbam_roundtrip(tmp_path, rng):
    X = _dosages(rng, 20, 7)
    path = str(tmp_path / "geno.txt")
    names = [f"rs{i}" for i in range(7)]
    bimbam.write_geno(path, X, names)
    X2, names2 = bimbam.read_geno(path)
    assert names2 == names
    np.testing.assert_allclose(X2, X, rtol=1e-5, equal_nan=True)


def test_bimbam_pheno_matrix_roundtrip(tmp_path, rng):
    y = rng.normal(size=15).astype(np.float32)
    y[3] = np.nan
    bimbam.write_pheno(str(tmp_path / "p.txt"), y)
    y2 = bimbam.read_pheno(str(tmp_path / "p.txt"))
    np.testing.assert_allclose(y2, y, rtol=1e-6, equal_nan=True)
    M = rng.normal(size=(10, 3)).astype(np.float32)
    bimbam.write_matrix(str(tmp_path / "m.txt"), M)
    np.testing.assert_allclose(bimbam.read_matrix(str(tmp_path / "m.txt")),
                               M, rtol=1e-6)


def test_plink_bed_roundtrip(tmp_path, rng):
    n, p = 13, 9  # deliberately not multiples of 4
    X = rng.integers(0, 3, size=(n, p)).astype(np.float32)
    X[2, 1] = np.nan
    prefix = str(tmp_path / "test")
    plink.write_bed(prefix, X)
    d = plink.read_bed(prefix, use_native=False)
    np.testing.assert_array_equal(np.isnan(d.X), np.isnan(X))
    np.testing.assert_allclose(d.X, X, equal_nan=True)
    assert len(d.snp_ids) == p and len(d.sample_ids) == n
    # subset selection
    d2 = plink.read_bed(prefix, snp_indices=[1, 4, 7], use_native=False)
    np.testing.assert_allclose(d2.X, X[:, [1, 4, 7]], equal_nan=True)


@pytest.mark.skipif(not bed_native.available(),
                    reason="native toolchain unavailable")
def test_plink_bed_native_matches_numpy(tmp_path, rng):
    n, p = 37, 21
    X = rng.integers(0, 3, size=(n, p)).astype(np.float32)
    X[5, 2] = np.nan
    prefix = str(tmp_path / "nat")
    plink.write_bed(prefix, X)
    d_np = plink.read_bed(prefix, use_native=False)
    d_nat = plink.read_bed(prefix, use_native=True)
    np.testing.assert_allclose(d_nat.X, d_np.X, equal_nan=True)


@pytest.mark.skipif(not bed_native.available(),
                    reason="native toolchain unavailable")
def test_native_filtered_matrix_stream(tmp_path, rng):
    M = rng.normal(size=(30, 30)).astype(np.float32)
    path = str(tmp_path / "mat.txt")
    np.savetxt(path, M, fmt="%.6f")
    idx = np.array([2, 7, 11, 29])
    got = bed_native.read_filtered_matrix(path, idx)
    # atol floor: the file holds %.6f-rounded values, so entries near zero
    # can never match the original floats to a pure relative tolerance
    np.testing.assert_allclose(got, M[np.ix_(idx, idx)], rtol=1e-5,
                               atol=1e-6)


def test_traw_roundtrip(tmp_path, rng):
    n, p = 8, 5
    X = rng.integers(0, 3, size=(n, p)).astype(np.float32)
    path = str(tmp_path / "g.traw")
    with open(path, "w") as f:
        samples = [f"F{i}_I{i}" for i in range(n)]
        f.write("CHR\tSNP\t(C)M\tPOS\tCOUNTED\tALT\t" + "\t".join(samples) + "\n")
        for j in range(p):
            vals = "\t".join(str(v) for v in X[:, j])
            f.write(f"1\trs{j}\t0\t{j+1}\tA\tT\t{vals}\n")
    d = traw.read_traw(path)
    np.testing.assert_allclose(d.X, X)
    assert d.snp_ids == [f"rs{j}" for j in range(p)]


def test_rawbin_roundtrip(tmp_path, rng):
    M = rng.normal(size=(12, 6)).astype(np.float32)
    prefix = str(tmp_path / "m")
    rawbin.write_rawbin(prefix, M)
    np.testing.assert_allclose(np.asarray(rawbin.read_rawbin(prefix)), M)


def test_preprocess(rng):
    X = _dosages(rng, 50, 10, miss=0.2)
    Xi = pp.mean_impute(X)
    assert not np.isnan(Xi).any()
    col = 3
    obs = X[:, col][~np.isnan(X[:, col])]
    np.testing.assert_allclose(Xi[np.isnan(X[:, col]), col], obs.mean(),
                               rtol=1e-5)
    Xs = pp.standardize(Xi)
    np.testing.assert_allclose(Xs.mean(0), 0, atol=1e-5)
    np.testing.assert_allclose(Xs.std(0), 1, atol=1e-5)
    Xi[:, 5] = 2.0
    Xk, _, keep = pp.drop_zero_variance(Xi)
    assert not keep[5] and Xk.shape[1] == 9
    y = rng.normal(size=50) ** 3
    yq = pp.quantile_normalize(y)
    assert abs(yq.mean()) < 0.05 and 0.8 < yq.std() < 1.1
    pcs = pp.pca_covariates(Xk, n_pcs=3)
    assert pcs.shape == (50, 3)
    pv = rng.uniform(size=1000)
    lam = pp.genomic_control_lambda(pv)
    assert 0.8 < lam < 1.2


def test_kinship_blocked_matches_direct(rng):
    X = rng.normal(size=(40, 30)).astype(np.float32)
    K1 = kinship_blocked(X, block=7)
    Xc = X - X.mean(0)
    np.testing.assert_allclose(K1, Xc @ Xc.T / 30, rtol=1e-4, atol=1e-5)


def test_streamer(rng):
    X = rng.normal(size=(16, 50)).astype(np.float32)
    blocks = list(SnpBlockStreamer(X, block=16))
    assert [b[0] for b in blocks] == [0, 16, 32, 48]
    assert all(np.asarray(b[2]).shape == (16, 16) for b in blocks)
    last = np.asarray(blocks[-1][2])
    np.testing.assert_allclose(last[:, :2], X[:, 48:])
    np.testing.assert_allclose(last[:, 2:], 0.0)


def test_checkpoint_roundtrip(tmp_path, rng):
    ck = RunCheckpoint(str(tmp_path / "run"))
    ev = rng.normal(size=10)
    U = rng.normal(size=(10, 10))
    ck.save_eigen(ev, U, key="abc")
    assert ck.load_eigen("other") is None
    ev2, U2 = ck.load_eigen("abc")
    np.testing.assert_allclose(ev2, ev)
    cols = {"beta": rng.normal(size=5), "F_wald": rng.normal(size=5)}
    ck.save_block(0, cols)
    assert ck.has_block(0) and not ck.has_block(5)
    got = ck.load_block(0)
    np.testing.assert_allclose(got["beta"], cols["beta"])
    assert ck.completed_blocks() == [0]


def test_pygemma_resume(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import oracle

    from pygemma_tpu import GwasConfig, pygemma

    y, G, W, K = oracle.simulate(n=80, p=12, c=2, seed=3)
    cfg = GwasConfig(dtype="float64", snp_block=4)
    rd = str(tmp_path / "ck")
    df1 = pygemma(y, G, W, K, config=cfg, run_dir=rd)
    # resume: all blocks cached; must reproduce identically
    df2 = pygemma(y, G, W, K, config=cfg, run_dir=rd)
    np.testing.assert_allclose(df1["p_wald"], df2["p_wald"], rtol=0)


def test_plotting_smoke(tmp_path, rng):
    import pandas as pd

    from pygemma_tpu.plotting import manhattan_plot, qq_plot

    df = pd.DataFrame({
        "p_wald": rng.uniform(size=200),
        "chrom": np.repeat([1, 2], 100),
        "pos": np.tile(np.arange(100), 2),
    })
    manhattan_plot(df, save_path=str(tmp_path / "mh.png"))
    qq_plot(df["p_wald"], save_path=str(tmp_path / "qq.png"))
    assert os.path.exists(tmp_path / "mh.png")
    assert os.path.exists(tmp_path / "qq.png")
    # reference option parity (reference plotting/plot.py:15-22): linear
    # scale plots raw p with the cutoff left on the p scale; cmap cycles
    # per chromosome; seaborn styling is optional
    ax = manhattan_plot(df, scale="linear", cutoff=0.01,
                        save_path=str(tmp_path / "mh_lin.png"))
    assert ax.get_ylabel() == r"$p$"
    manhattan_plot(df, cmap="viridis",
                   save_path=str(tmp_path / "mh_cmap.png"))
    manhattan_plot(df, cmap=["#123456", "#654321"], use_seaborn=True,
                   save_path=str(tmp_path / "mh_sns.png"))
    assert os.path.exists(tmp_path / "mh_lin.png")
    assert os.path.exists(tmp_path / "mh_cmap.png")
    with pytest.raises(ValueError):
        manhattan_plot(df, scale="sqrt")


def test_plotting_interactive(tmp_path, rng):
    """Interactive plotly Manhattan: per-chromosome traces, hover text on
    significant SNPs, chromosome ticks (reference plotting/plot.py:106-237).
    Skips cleanly where plotly isn't installed (this image); the matplotlib
    path above is always exercised."""
    import pandas as pd
    import pytest as _pytest

    from pygemma_tpu.plotting import manhattan_plot

    p = rng.uniform(size=200)
    p[7] = 1e-9  # guaranteed significant -> hover layer exists
    df = pd.DataFrame({
        "p_wald": p,
        "chrom": np.repeat([1, 2], 100),
        "pos": np.tile(np.arange(100), 2),
        "beta": rng.normal(size=200),
        "SNPs": [f"rs{i}" for i in range(200)],
    })
    try:
        import plotly  # noqa: F401
    except ImportError:
        with _pytest.raises(ImportError, match="plotly"):
            manhattan_plot(df, interactive=True)
        return
    fig = manhattan_plot(df, interactive=True,
                         save_path=str(tmp_path / "mh.html"))
    assert os.path.exists(tmp_path / "mh.html")
    hover_traces = [t for t in fig.data if t.hoverinfo == "text"]
    assert hover_traces and any("beta" in h for t in hover_traces
                                for h in t.hovertext)
    assert list(fig.layout.xaxis.ticktext) == ["1", "2"]


def test_pygemma_resume_rejects_changed_settings(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import oracle
    import pytest as _pytest

    from pygemma_tpu import GwasConfig, pygemma

    y, G, W, K = oracle.simulate(n=60, p=6, c=1, seed=2)
    cfg = GwasConfig(dtype="float64", snp_block=4)
    rd = str(tmp_path / "ck")
    pygemma(y, G, W, K, config=cfg, run_dir=rd)
    with _pytest.raises(ValueError, match="different"):
        pygemma(y, G, W, K, config=cfg, run_dir=rd, tests=("wald", "score"))


def test_quantized_matrix_host_and_device_paths(tmp_path, rng):
    """QuantizedMatrix: host slices equal standardized f32; the streamer's
    on-device dequantization matches them; rawbin_i8 round-trips; missing
    codes mean-impute (standardized value 0)."""
    from pygemma_tpu.io.quantized import (MISSING_CODE, QuantizedMatrix,
                                          write_rawbin_i8)

    n, p = 32, 21
    G = rng.integers(0, 3, size=(n, p)).astype(np.int8)
    G[1, 3] = MISSING_CODE
    G[7, 3] = MISSING_CODE
    Q = QuantizedMatrix.from_dosages(G, mode="standardize")
    assert Q.shape == (n, p) and Q.dtype == np.float32

    # host oracle: mean-impute then standardize
    Xf = G.astype(np.float32)
    Xf[G == MISSING_CODE] = np.nan
    mu = np.nanmean(Xf, axis=0)
    Xf = np.where(np.isnan(Xf), mu, Xf)
    Xs = (Xf - Xf.mean(0)) / np.maximum(Xf.std(0), 1e-6)
    np.testing.assert_allclose(Q[:, :], Xs, atol=2e-5)
    np.testing.assert_allclose(Q[:, 3:9], Xs[:, 3:9], atol=2e-5)
    assert abs(Q[:, 3][1]) < 1e-6  # missing -> standardized 0

    # streamer device path (int8 transfer + on-device affine)
    blocks = list(SnpBlockStreamer(Q, block=16))
    dev = np.concatenate([np.asarray(b[2]) for b in blocks], axis=1)[:, :p]
    np.testing.assert_allclose(dev, Xs, atol=2e-5)

    # rawbin_i8 persistence round-trip ((p, n) layout on disk)
    prefix = str(tmp_path / "q")
    write_rawbin_i8(prefix, Q.data.T, Q.mu, Q.sd)
    Q2 = QuantizedMatrix.open_rawbin(prefix)
    np.testing.assert_allclose(Q2[:, :], Xs, atol=2e-5)


def test_pygemma_quantized_matches_float32(rng):
    """End-to-end: the public driver on a QuantizedMatrix reproduces the
    float32-genotype scan (the int8 codes + affine are an exact encoding)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import oracle  # noqa: F401

    from pygemma_tpu import GwasConfig, pygemma
    from pygemma_tpu.io.quantized import QuantizedMatrix

    n, p = 96, 40
    G = rng.integers(0, 3, size=(n, p)).astype(np.int8)
    Q = QuantizedMatrix.from_dosages(G, mode="standardize")
    Xs = Q[:, :]
    K = (Xs @ Xs.T / p + 1e-3 * np.eye(n)).astype(np.float32)
    y = (Xs[:, 0] * 0.4 + rng.normal(size=n)).astype(np.float32)
    cfg = GwasConfig(snp_block=16)
    df_q = pygemma(y, Q, None, K, config=cfg)
    df_f = pygemma(y, Xs, None, K, config=cfg)
    np.testing.assert_allclose(df_q["beta"], df_f["beta"], rtol=1e-5)
    np.testing.assert_allclose(df_q["p_wald"], df_f["p_wald"], rtol=1e-4)


def test_packed_matrix_host_and_device_paths(tmp_path, rng):
    """PackedMatrix (2-bit codes): pack/unpack round-trip, host slices equal
    standardized f32, on-device unpack matches, rawbin_2bit round-trips."""
    from pygemma_tpu.io.packed import (MISSING_2BIT, PackedMatrix,
                                       pack_codes, unpack_codes,
                                       write_rawbin_2bit)

    n, p = 37, 21  # n deliberately not a multiple of 4
    G = rng.integers(0, 3, size=(n, p)).astype(np.uint8)
    G[1, 3] = MISSING_2BIT
    G[7, 3] = MISSING_2BIT
    np.testing.assert_array_equal(unpack_codes(pack_codes(G), n), G)

    Q = PackedMatrix.from_codes(G)
    assert Q.shape == (n, p) and Q.dtype == np.float32

    # host oracle: mean-impute then standardize
    Xf = G.astype(np.float32)
    Xf[G == MISSING_2BIT] = np.nan
    mu = np.nanmean(Xf, axis=0)
    Xf = np.where(np.isnan(Xf), mu, Xf)
    Xs = (Xf - Xf.mean(0)) / np.maximum(Xf.std(0), 1e-6)
    np.testing.assert_allclose(Q[:, :], Xs, atol=2e-5)
    np.testing.assert_allclose(Q[:, 3:9], Xs[:, 3:9], atol=2e-5)
    np.testing.assert_allclose(Q[5:11, 3:9], Xs[5:11, 3:9], atol=2e-5)
    assert abs(Q[:, 3][1]) < 1e-6  # missing -> standardized 0

    # streamer device path (2-bit transfer + on-device unpack/affine)
    blocks = list(SnpBlockStreamer(Q, block=16))
    dev = np.concatenate([np.asarray(b[2]) for b in blocks], axis=1)[:, :p]
    np.testing.assert_allclose(dev, Xs, atol=2e-5)

    # rawbin_2bit persistence round-trip ((p, n4) layout on disk)
    prefix = str(tmp_path / "pk")
    write_rawbin_2bit(prefix, G, Q.mu, Q.sd)
    Q2 = PackedMatrix.open_rawbin(prefix)
    np.testing.assert_allclose(Q2[:, :], Xs, atol=2e-5)


def test_device_block_cache_and_prefill(tmp_path, rng, monkeypatch):
    """Device-resident packed-block cache: prefill ships every block once
    (no dequantization), the streamer then serves identical blocks from
    the cache, and the budget bounds insertion."""
    from pygemma_tpu.io import streaming
    from pygemma_tpu.io.packed import PackedMatrix, write_rawbin_2bit

    n, p, B = 24, 40, 16
    G = rng.integers(0, 3, size=(n, p)).astype(np.uint8)
    Q0 = PackedMatrix.from_codes(G)
    prefix = str(tmp_path / "pc")
    write_rawbin_2bit(prefix, G, Q0.mu, Q0.sd)
    Q = PackedMatrix.open_rawbin(prefix)
    assert Q.cache_token and prefix in Q.cache_token

    ref = np.concatenate(
        [np.asarray(b[2]) for b in SnpBlockStreamer(Q, block=B)],
        axis=1)[:, :p]

    monkeypatch.setenv("PYGEMMA_TPU_GENO_DEV_CACHE_MB", "64")
    streaming.clear_device_block_cache()
    try:
        n_put = streaming.prefill_device_cache(Q, B)
        assert n_put == (p + B - 1) // B
        assert len(streaming._DEV_BLOCK_CACHE) == n_put
        # second prefill is a no-op (all keys present)
        assert streaming.prefill_device_cache(Q, B) == 0
        # the streamer serves the cached blocks bit-identically
        hit = np.concatenate(
            [np.asarray(b[2]) for b in SnpBlockStreamer(Q, block=B)],
            axis=1)[:, :p]
        np.testing.assert_array_equal(hit, ref)
        # a cols() view gets distinct keys (offset in the token)
        sub = Q.cols(16, 40)
        assert sub.cache_token != Q.cache_token
        streaming.prefill_device_cache(sub, B)
        hit2 = np.concatenate(
            [np.asarray(b[2]) for b in SnpBlockStreamer(sub, block=B)],
            axis=1)[:, : p - 16]
        np.testing.assert_array_equal(hit2, ref[:, 16:])
        # zero budget disables caching entirely
        monkeypatch.setenv("PYGEMMA_TPU_GENO_DEV_CACHE_MB", "0")
        streaming.clear_device_block_cache()
        assert streaming.prefill_device_cache(Q, B) == 0
        assert not streaming._DEV_BLOCK_CACHE
    finally:
        streaming.clear_device_block_cache()


def test_packed_bed_coding_streams_verbatim(tmp_path, rng):
    """open_bed wraps a PLINK fileset: raw bed bytes decode on device to the
    same standardized matrix the host reader produces."""
    from pygemma_tpu.io.packed import PackedMatrix

    n, p = 29, 11
    X = rng.integers(0, 3, size=(n, p)).astype(np.float32)
    X[2, 1] = np.nan
    X[9, 1] = np.nan
    prefix = str(tmp_path / "pbed")
    plink.write_bed(prefix, X)

    Q = PackedMatrix.open_bed(prefix)
    assert Q.coding == "bed" and Q.shape == (n, p)

    # oracle from the host reader: mean-impute + standardize
    d = plink.read_bed(prefix, use_native=False)
    Xi = pp.mean_impute(d.X)
    Xs = pp.standardize(Xi)
    np.testing.assert_allclose(Q[:, :], Xs, atol=2e-5)

    blocks = list(SnpBlockStreamer(Q, block=8))
    dev = np.concatenate([np.asarray(b[2]) for b in blocks], axis=1)[:, :p]
    np.testing.assert_allclose(dev, Xs, atol=2e-5)


def test_pygemma_packed_matches_float32(rng):
    """End-to-end: the public driver on a PackedMatrix reproduces the
    float32-genotype scan (2-bit codes + affine are an exact encoding)."""
    from pygemma_tpu import GwasConfig, pygemma
    from pygemma_tpu.io.packed import PackedMatrix

    n, p = 96, 40
    G = rng.integers(0, 3, size=(n, p)).astype(np.uint8)
    Q = PackedMatrix.from_codes(G)
    Xs = Q[:, :]
    K = (Xs @ Xs.T / p + 1e-3 * np.eye(n)).astype(np.float32)
    y = (Xs[:, 0] * 0.4 + rng.normal(size=n)).astype(np.float32)
    cfg = GwasConfig(snp_block=16)
    df_q = pygemma(y, Q, None, K, config=cfg)
    df_f = pygemma(y, Xs, None, K, config=cfg)
    np.testing.assert_allclose(df_q["beta"], df_f["beta"], rtol=1e-5)
    np.testing.assert_allclose(df_q["p_wald"], df_f["p_wald"], rtol=1e-4)


def test_quantized_scalar_and_mode_validation(rng):
    """ADVICE r2: scalar indexing imputes missing entries like slices do;
    bad from_dosages mode raises; out-of-int8-range dosages raise."""
    import pytest as _pytest

    from pygemma_tpu.io.quantized import MISSING_CODE, QuantizedMatrix

    n, p = 16, 5
    G = rng.integers(0, 3, size=(n, p)).astype(np.int8)
    G[2, 1] = MISSING_CODE
    Q = QuantizedMatrix.from_dosages(G)
    assert float(Q[2, 1]) == 0.0  # missing scalar -> imputed 0, not raw code
    assert np.isclose(float(Q[0, 0]), Q[:, 0][0])
    with _pytest.raises(ValueError, match="mode"):
        QuantizedMatrix.from_dosages(G, mode="standardise")
    Gbig = G.astype(np.int32)
    Gbig[0, 0] = -999
    with _pytest.raises(ValueError, match="int8 range"):
        QuantizedMatrix.from_dosages(Gbig)


def test_pygemma_checks_quantized_sidecars(rng):
    """disable_checks=False validates mu/sd sidecars on quantized input."""
    import pytest as _pytest

    from pygemma_tpu import pygemma
    from pygemma_tpu.io.quantized import QuantizedMatrix

    n, p = 30, 6
    G = rng.integers(0, 3, size=(n, p)).astype(np.int8)
    Q = QuantizedMatrix.from_dosages(G)
    Q.sd[2] = 0.0  # corrupt sidecar
    y = rng.normal(size=n).astype(np.float32)
    K = np.eye(n, dtype=np.float32)
    with _pytest.raises(ValueError, match="sidecar"):
        pygemma(y, Q, None, K, disable_checks=False)
