"""Results visualization."""

from velocity_tpu.viz.plots import plot_results, save_results_html  # noqa: F401
