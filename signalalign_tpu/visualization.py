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

def plot_kmer_distributions(model_dists, kmer: str, out_path: str,
                            assignments=None) -> str:
    """Overlay one kmer's distributions across models: ONT Gaussian +
    HDP posterior predictive per model, optional event-mean KDE of
    assignment data (compare_trained_models.py:66-242
    plot_kmer_distribution / hiddenMarkovModel.py plot_kmer_distribution).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from signalalign_tpu.compare import gaussian_pdf

    fig, ax = plt.subplots(figsize=(10, 5))
    for md in model_dists:
        x = md.linspace
        try:
            mean, sd = md.gaussian_params(kmer)
            ax.plot(x, gaussian_pdf(x, mean, sd), "--", lw=1.2,
                    label=f"{md.name} ONT N({mean:.1f}, {sd:.2f})")
        except (KeyError, ValueError):
            pass
        hdp_y = md.hdp_distribution(kmer)
        if hdp_y is not None and len(hdp_y) and hdp_y.max() > 0:
            ax.plot(md.hdp.grid, hdp_y, "-", lw=1.4,
                    label=f"{md.name} HDP")
    if assignments is not None and len(assignments):
        vals = np.asarray(assignments, dtype=np.float64)
        # gaussian KDE, bandwidth 0.5 (the reference's KernelDensity setup)
        x = model_dists[0].linspace
        z = (x[:, None] - vals[None, :]) / 0.5
        kde = np.exp(-0.5 * z * z).sum(axis=1) / (
            len(vals) * 0.5 * np.sqrt(2 * np.pi))
        ax.plot(x, kde, ":", lw=1.2, label=f"KDE ({len(vals)} events)")
        ax.plot(vals, -0.005 - 0.01 * np.random.default_rng(0)
                .random(len(vals)), "+k", ms=4)
    ax.set_title(kmer)
    ax.set_xlabel("event mean (pA)")
    ax.set_ylabel("density")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_model_comparisons(kls, hels, deltas, out_path: str,
                           label: str = "model1 vs model2") -> str:
    """3-panel histogram of per-kmer KL / Hellinger / median-delta
    distances (compare_trained_models.py:490-578
    plot_all_model_comparisons)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 1, figsize=(10, 9))
    panels = [
        ("Kullback-Leibler divergence (bits)",
         [x for x in kls if x is not None and x > 0]),
        ("Hellinger distance", [x for x in hels if x > 0]),
        ("abs(median delta) (pA)", [x for x in deltas if x > 0]),
    ]
    for ax, (title, vals) in zip(axes, panels):
        vals = vals or [0.0]
        ax.hist(vals, bins=np.linspace(0, max(vals) or 1.0, 30),
                alpha=0.7, label=f"{label} | {len(vals)} kmers")
        ax.set_title(title)
        ax.set_ylabel("count")
        ax.grid(alpha=0.4)
        ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
