"""Query-definition modules; imported by registry.load_all()."""
