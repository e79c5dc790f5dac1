"""Reusable operator layer (SURVEY.md section 2.2): operators Spark lacks
as built-ins, expressed as compositions of DataFrame ops -- as-of joins,
dedup families, similarity search, stateful stream ops, multimodal plumbing.

The declared queries in ``iot_data_pipeline_spark.queries`` are the
oracle-checked *instantiations*; this package is the general API a user
programs against.
"""
