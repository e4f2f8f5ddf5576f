from .tokenizer import WordTokenizer, get_tokenizer
from .cache import NewsCache, Behaviors, build_news_cache, build_behaviors
from .synthetic import generate_synthetic_mind
from .loader import TrainLoader, NewsLoader, EvalLoader, HistoryLoader

__all__ = [
    "WordTokenizer",
    "get_tokenizer",
    "NewsCache",
    "Behaviors",
    "build_news_cache",
    "build_behaviors",
    "generate_synthetic_mind",
    "TrainLoader",
    "NewsLoader",
    "EvalLoader",
    "HistoryLoader",
]
