from .analysis import StatisticAnalysis, load_metrics_jsonl

__all__ = ["StatisticAnalysis", "load_metrics_jsonl"]
