from .logger import init_logger
from .platform import auto_pin_platform

__all__ = ["init_logger", "auto_pin_platform"]
