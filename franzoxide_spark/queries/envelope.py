"""Placeholder — populated in later milestones."""
