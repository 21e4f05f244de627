"""Pipeline orchestration + the driver-facing query registry."""
