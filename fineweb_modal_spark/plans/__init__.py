"""End-to-end DAGs and the gate-query registry."""
