"""Pure functions: DSL parsing, predicate compilation, cell codec,
geometry kernels, text analysis."""
