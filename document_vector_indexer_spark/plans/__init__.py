"""End-to-end pipeline plans."""
