"""Manhattan and QQ plots for association results.

API parity with the reference plotting layer (reference plotting/plot.py:15
``manhattan_plot`` and :276 ``qq_plot``), re-implemented on matplotlib with
the same cutoff semantics: Bonferroni, genome-wide 5e-8, or a fixed
-log10 threshold (reference plotting/plot.py:87-104).  The reference's
optional plotly interactive path is gated behind ``interactive=True``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def manhattan_plot(
    df,
    pval_col: str = "p_wald",
    chrom_col: str = "chrom",
    pos_col: str = "pos",
    cutoff: str | float = "bonferroni",
    save_path: Optional[str] = None,
    title: Optional[str] = None,
    interactive: bool = False,
    ax=None,
):
    """Manhattan plot; ``df`` is the association DataFrame.

    cutoff: "bonferroni" (0.05/p), "gw" (5e-8) or a fixed -log10 value
    (reference plotting/plot.py:87-104).
    """
    p = np.asarray(df[pval_col], dtype=float)
    m = np.isfinite(p) & (p > 0)
    logp = np.full(p.shape, np.nan)
    logp[m] = -np.log10(p[m])

    if chrom_col in getattr(df, "columns", []):
        chrom = np.asarray(df[chrom_col])
        pos = (
            np.asarray(df[pos_col], dtype=float)
            if pos_col in df.columns
            else np.arange(len(p), dtype=float)
        )
    else:
        chrom = np.ones(len(p), dtype=int)
        pos = np.arange(len(p), dtype=float)

    if cutoff == "bonferroni":
        thr = -np.log10(0.05 / max(m.sum(), 1))
    elif cutoff == "gw":
        thr = -np.log10(5e-8)
    else:
        thr = float(cutoff)

    if interactive:
        return _manhattan_plotly(chrom, pos, logp, thr, save_path, title)

    plt = _mpl()
    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots(figsize=(12, 4))
    offset = 0.0
    uniq = list(dict.fromkeys(chrom.tolist()))
    colors = ["#4C72B0", "#55A868"]
    for i, ch in enumerate(uniq):
        sel = chrom == ch
        order = np.argsort(pos[sel])
        xs = offset + np.arange(sel.sum(), dtype=float)
        ax.scatter(xs, logp[sel][order], s=4, c=colors[i % 2], rasterized=True)
        offset += sel.sum()
    ax.axhline(thr, color="red", ls="--", lw=1)
    ax.set_xlabel("position")
    ax.set_ylabel(r"$-\log_{10}(p)$")
    if title:
        ax.set_title(title)
    if save_path and own_fig:
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return ax


def _manhattan_plotly(chrom, pos, logp, thr, save_path, title):
    try:
        import plotly.graph_objects as go
    except Exception as e:  # pragma: no cover
        raise ImportError("plotly not available for interactive plots") from e
    fig = go.Figure(
        go.Scattergl(x=np.arange(len(logp)), y=logp, mode="markers",
                     marker=dict(size=3))
    )
    fig.add_hline(y=thr, line_dash="dash", line_color="red")
    if title:
        fig.update_layout(title=title)
    if save_path:
        fig.write_html(save_path)
    return fig


def qq_plot(pvals: Sequence[float], save_path: Optional[str] = None,
            title: Optional[str] = None, ax=None):
    """QQ plot of observed vs expected -log10 p under uniformity
    (reference plotting/plot.py:276-342)."""
    p = np.asarray(pvals, dtype=float)
    p = p[np.isfinite(p) & (p > 0)]
    n = len(p)
    obs = -np.log10(np.sort(p))
    exp = -np.log10((np.arange(1, n + 1) - 0.5) / n)

    plt = _mpl()
    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots(figsize=(5, 5))
    ax.scatter(exp, obs, s=5, rasterized=True)
    lim = max(exp.max() if n else 1.0, obs.max() if n else 1.0)
    ax.plot([0, lim], [0, lim], "r--", lw=1)
    ax.set_xlabel(r"expected $-\log_{10}(p)$")
    ax.set_ylabel(r"observed $-\log_{10}(p)$")
    if title:
        ax.set_title(title)
    if save_path and own_fig:
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return ax
