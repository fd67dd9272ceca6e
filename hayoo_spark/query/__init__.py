"""Query surface: parser -> AST -> executors (relational / block-max WAND)."""
