"""Plotting utilities: labelled raw-signal reads and variant accuracy.

reference: visualization/plot_labelled_read.py + validateSignalAlignment
plot generation and visualization/plot_variant_accuracy.py (simplified to
the core plots; the reference ships ~3k lines of experiment-specific
figures).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def plot_labelled_read(raw_signal: np.ndarray, labels: np.ndarray,
                       out_path: str, title: str = "",
                       window: Optional[tuple] = None,
                       max_labels: int = 400) -> str:
    """Raw signal with MEA label segments (kmer + posterior colouring).

    ``labels`` is the embedded MEA label table (raw_start, raw_length,
    reference_index, posterior_probability, kmer)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    lo, hi = window or (int(labels["raw_start"][0]),
                        int(labels["raw_start"][min(len(labels) - 1,
                                                    max_labels)]
                            + labels["raw_length"][min(len(labels) - 1,
                                                       max_labels)]))
    fig, ax = plt.subplots(figsize=(16, 4))
    xs = np.arange(lo, min(hi, len(raw_signal)))
    ax.plot(xs, raw_signal[lo:min(hi, len(raw_signal))], lw=0.4,
            color="0.4", zorder=1)
    cmap = plt.get_cmap("viridis")
    for row in labels:
        s, l = int(row["raw_start"]), int(row["raw_length"])
        if s + l < lo or s > hi:
            continue
        p = float(row["posterior_probability"])
        ax.axvspan(s, s + l, color=cmap(p), alpha=0.25, zorder=0)
    ax.set_xlabel("raw sample")
    ax.set_ylabel("current (pA)")
    ax.set_title(title or "MEA-labelled read")
    sm = plt.cm.ScalarMappable(cmap=cmap)
    sm.set_array([0, 1])
    fig.colorbar(sm, ax=ax, label="posterior")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_variant_accuracy(labelled: "pandas.DataFrame", out_path: str,
                          variants: str = "CE") -> str:
    """Per-site called-probability distribution split by truth label
    (plot_variant_accuracy.py core panel)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(variants), figsize=(5 * len(variants), 4),
                             squeeze=False)
    for ax, v in zip(axes[0], variants):
        truth = labelled[labelled[v + "_label"] == 1]
        other = labelled[labelled[v + "_label"] == 0]
        ax.hist(truth[v], bins=20, alpha=0.6, label=f"true {v}",
                color="tab:green")
        ax.hist(other[v], bins=20, alpha=0.6, label=f"not {v}",
                color="tab:red")
        ax.set_xlabel(f"P({v})")
        ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    import matplotlib.pyplot as plt2
    plt2.close(fig)
    return out_path
