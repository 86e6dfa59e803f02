"""Control plane: chunk ledger, work discovery, gap analysis, repair."""
