from .logging import get_logger, log_result

__all__ = ["get_logger", "log_result"]
