from .animate import Animation, draw_paths_figure, load_case_yaml, load_schedule_yaml

__all__ = ["Animation", "draw_paths_figure", "load_case_yaml",
           "load_schedule_yaml"]
