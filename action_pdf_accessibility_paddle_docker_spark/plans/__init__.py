"""DataFrame pipeline builders: extraction plan, lineage, checkpoint-resume."""
