from owl2jsonschema_js_spark.sources.tableio import TableIO

__all__ = ["TableIO"]
