from .ssc_metrics import SSCMetrics  # noqa: F401
