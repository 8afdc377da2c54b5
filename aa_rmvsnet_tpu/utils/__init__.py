"""Metrics, typed configuration, and logging utilities."""

from .metrics import threshold_error_rate, abs_depth_error, MeterDict
