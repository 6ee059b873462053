from owl2jsonschema_js_spark.functions.vectors import cosine, dot, l2norm

__all__ = ["cosine", "dot", "l2norm"]
