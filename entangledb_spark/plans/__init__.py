"""SQL dialect front-end: lexer → parser → AST → planner → DataFrame."""
