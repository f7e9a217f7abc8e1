"""End-to-end Ray Data pipelines: index build, query helpers, and the
driver-contract query implementations."""
