"""Plot generation (matplotlib/scipy equivalents of heatmap.r / dendro.R)."""

import os

import pytest

GOLD = os.path.join(os.path.dirname(__file__), "golden", "abcde")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLD, "matrix_plain.csv")),
    reason="golden CSVs absent")
def test_plots_render(tmp_path):
    pytest.importorskip("matplotlib")
    pytest.importorskip("scipy")
    from commet_tpu.viz import plots

    heat = str(tmp_path / "heatmap_plain.png")
    dend = str(tmp_path / "dendro.png")
    plots.heatmap_png(os.path.join(GOLD, "matrix_plain.csv"),
                      os.path.join(GOLD, "matrix_normalized.csv"),
                      heat, "Commet plain analysis")
    plots.dendrogram_png(os.path.join(GOLD, "matrix_normalized.csv"), dend)
    assert os.path.getsize(heat) > 5000
    assert os.path.getsize(dend) > 5000

    # row/col ordering comes from clustering the normalized matrix
    names, norm = plots.read_matrix_csv(
        os.path.join(GOLD, "matrix_normalized.csv"))
    order, link = plots._linkage_order(norm)
    assert sorted(order.tolist()) == list(range(len(names)))
