"""placeholder — filled in by subsequent milestones."""
