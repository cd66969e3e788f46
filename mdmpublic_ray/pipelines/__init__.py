"""End-to-end pipelines and the conformance query registry."""
