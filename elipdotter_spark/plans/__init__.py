"""Query AST -> DataFrame plan compilation."""
