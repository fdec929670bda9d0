"""Smoke tests for the plotting toolkit (figures written, stats sane)."""

import os

import numpy as np
import pandas as pd

ONED = "/root/reference/tests/minion_test_reads/1D"
MODEL = "/root/reference/models/testModelR9p4_5mer_acegt_template.model"


def test_em_model_distributions(tmp_path):
    from signalalign_tpu.visualization import plot_em_model_distributions
    out = plot_em_model_distributions(
        [MODEL, MODEL], ["ACGTA", "TTTTT"], str(tmp_path / "em.png"),
        assignments={"ACGTA": list(np.random.default_rng(0)
                                   .normal(85, 2, 100))})
    assert os.path.exists(out)


def test_multiclass_variant_accuracy(tmp_path):
    from signalalign_tpu.visualization import \
        plot_multiclass_variant_accuracy
    rng = np.random.default_rng(1)
    n = 200
    label = rng.choice(list("CE"), size=n)
    pE = np.clip(rng.normal(0.2 + 0.6 * (label == "E"), 0.2), 0, 1)
    df = pd.DataFrame({"label": label, "E": pE, "C": 1 - pE})
    out = plot_multiclass_variant_accuracy(df, str(tmp_path), "smoke")
    assert set(out) == {"C", "E"}
    assert out["E"]["auc"] > 0.8
    assert os.path.exists(out["E"]["plot_path"])


def test_sequencing_summary(tmp_path):
    from signalalign_tpu.visualization import sequencing_summary
    df = sequencing_summary(
        os.path.join(ONED, "1D.bam"),
        os.path.join(ONED, "1D.fastq.index.readdb"), [ONED],
        out_dir=str(tmp_path))
    assert len(df) >= 3
    assert df["mapped"].any()
    assert os.path.exists(tmp_path / "sequencing_summary.png")
