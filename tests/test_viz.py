"""Figure-helper tests (the reference's cross-cutting L0 visualization).

Headless (Agg) smoke + contract tests: every helper must produce a
non-empty file, respect the fixed categorical order, and accept the array
shapes the examples feed it.
"""
import numpy as np

from universal_differential_equations_tpu import viz


def test_timeseries_with_data_and_train_window(tmp_path):
    ts = np.linspace(0, 10, 101)
    ys = np.stack([np.sin(ts), np.cos(ts)], axis=1)
    fig = viz.plot_timeseries(ts, ys, labels=["x", "y"], data=ys + 0.05,
                              title="t", ylabel="u", train_end=5.0)
    # fixed categorical order, never cycled
    lines = fig.axes[0].get_lines()
    assert lines[0].get_color() == viz.SERIES[0]
    assert lines[1].get_color() == viz.SERIES[1]
    p = viz.save(fig, tmp_path / "ts.pdf")
    assert p.stat().st_size > 1000


def test_timeseries_accepts_1d(tmp_path):
    ts = np.linspace(0, 1, 20)
    p = viz.save(viz.plot_timeseries(ts, np.sin(ts)), tmp_path / "1d.png")
    assert p.stat().st_size > 1000


def test_loss_history_filters_nonfinite(tmp_path):
    losses = np.array([1e3, 1.0, np.inf, 0.1, np.nan, 0.01])
    fig = viz.plot_loss_history(losses, stages=[("adam", 3), ("bfgs", 3)])
    p = viz.save(fig, tmp_path / "loss.pdf")
    assert p.stat().st_size > 1000


def test_field_sequential_and_diverging(tmp_path):
    field = np.random.default_rng(0).uniform(size=(26, 40))
    p1 = viz.save(viz.plot_field(field, (0, 1, 0, 1), title="u"),
                  tmp_path / "seq.pdf")
    p2 = viz.save(viz.plot_field(field - 0.5, (0, 1, 0, 1), diverging=True),
                  tmp_path / "div.pdf")
    assert p1.stat().st_size > 1000 and p2.stat().st_size > 1000
    # diverging midpoint is neutral (low chroma): r≈g≈b at the center
    mid = viz.DIV_CMAP(0.5)
    assert max(mid[:3]) - min(mid[:3]) < 0.05


def test_function_comparison_multicolumn(tmp_path):
    x = np.linspace(0, 1, 50)
    learned = np.stack([x * (1 - x), -x], axis=1)
    true_v = learned + 0.01
    fig = viz.plot_function_comparison(x, learned, true_v)
    p = viz.save(fig, tmp_path / "cmp.pdf")
    assert p.stat().st_size > 1000


def test_animate_profiles_gif(tmp_path):
    z = np.linspace(0, 1, 16)
    t = np.linspace(0, 2, 30)
    truth = np.sin(z[None, :] * 3 + t[:, None])
    pred = truth + 0.05
    p = viz.animate_profiles(tmp_path / "roll.gif", z, truth, pred=pred,
                             ts=t, title="free rollout")
    assert p.stat().st_size > 5000
    assert p.read_bytes()[:6] in (b"GIF87a", b"GIF89a")


def test_success_rates_labels(tmp_path):
    fig = viz.plot_success_rates([1e-3, 5e-3, 1e-2], [0.5, 0.34, 0.27],
                                 counts=100)
    ax = fig.axes[0]
    assert [t.get_text() for t in ax.get_xticklabels()] == \
        ["0.001", "0.005", "0.01"]
    p = viz.save(fig, tmp_path / "sr.pdf")
    assert p.stat().st_size > 1000


def test_training_dashboard_callback(tmp_path):
    # fit-protocol callback: rewrites the dashboard file on every call and
    # never requests an early stop
    calls = []

    def panel(ax, step, params):
        calls.append(step)
        ax.plot([0, 1], [0, params], color=viz.SERIES[1])

    dash = viz.TrainingDashboard(tmp_path / "dash.png", panel=panel)
    assert dash(50, 1.0, 0.5) is False
    size1 = (tmp_path / "dash.png").stat().st_size
    assert dash(100, 0.1, 0.7) is False
    assert (tmp_path / "dash.png").stat().st_size > 1000 and size1 > 1000
    assert calls == [50, 100]
    assert dash.losses == [1.0, 0.1]
