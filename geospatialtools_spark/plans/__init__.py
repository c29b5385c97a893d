"""Stage planning: checkpoint-resumable pipelines + per-partition lineage
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics")."""
