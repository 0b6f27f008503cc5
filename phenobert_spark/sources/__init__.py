"""phenobert_spark — PySpark-native HPO knowledge-graph construction engine."""
