from dagnn_tpu.utils.plot import plot_dag  # noqa: F401
