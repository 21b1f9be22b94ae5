from .registry import Registry, check_availability
from .logger import Logger, setup_logger, MetricWriter, mkdir_if_missing
from .meters import AverageMeter, MetricMeter
from .tools import (
    set_random_seed,
    check_isfile,
    verify_str_arg,
    tolist_if_not,
    collect_env_info,
    count_num_param,
)

__all__ = [
    "Registry",
    "check_availability",
    "Logger",
    "setup_logger",
    "MetricWriter",
    "mkdir_if_missing",
    "AverageMeter",
    "MetricMeter",
    "set_random_seed",
    "check_isfile",
    "verify_str_arg",
    "tolist_if_not",
    "collect_env_info",
    "count_num_param",
]
