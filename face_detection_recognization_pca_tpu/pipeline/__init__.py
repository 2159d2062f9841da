"""End-to-end pipeline apps: detect, train, scan, orchestrator, CLI."""
