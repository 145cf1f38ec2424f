"""QA / observability tooling (reference §2.8: compute_node_degrees.py,
visualize_explanations.py, visualize_improvements.py, test_setup.py,
validate_fixes.py)."""
