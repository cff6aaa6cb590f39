from .summary import summarize
