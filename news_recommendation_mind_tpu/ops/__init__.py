from .rnn import gru_scan, lstm_scan

__all__ = ["lstm_scan", "gru_scan"]
