"""File + console logger and timestamped checkpoint directory layout
(reference common.py:169-210): checkpoints/<YYYY-MM-DD_HH-MM>/train.log.
"""

import logging
import os
from datetime import datetime


class Logger:
    def __init__(self, log_path):
        log_name = os.path.basename(log_path)
        log_dir = os.path.dirname(log_path)
        if log_dir and not os.path.exists(log_dir):
            os.makedirs(log_dir, exist_ok=True)
        self.log_name = log_name if log_name else "train.log"
        self.log_path = log_path

    def init_logger(self):
        # keyed by full path: several runs in one process (tests, sweeps)
        # must not share file handlers
        logger = logging.getLogger(os.path.abspath(self.log_path))
        logger.setLevel(logging.INFO)
        if logger.handlers:          # idempotent across repeated init
            return logger
        fmt = logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s - %(message)s")

        file_handler = logging.FileHandler(self.log_path, "w")
        file_handler.setLevel(logging.INFO)
        file_handler.setFormatter(fmt)

        console_handler = logging.StreamHandler()
        console_handler.setLevel(logging.INFO)

        logger.addHandler(file_handler)
        logger.addHandler(console_handler)
        return logger


def make_logger(root_dir, time_str=None):
    """Create checkpoints/<timestamp>/ next to root_dir with a train.log."""
    if time_str is None:
        time_str = datetime.strftime(datetime.now(), "%Y-%m-%d_%H-%M")
    log_dir = os.path.join(root_dir, "..", "checkpoints", time_str)
    log_path = os.path.join(log_dir, "train.log")
    logger = Logger(log_path).init_logger()
    return log_dir, logger
