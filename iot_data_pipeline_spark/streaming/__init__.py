"""Structured Streaming surface: file-source ingest (the reference's
event-driven S3->Lambda->Fargate chain re-expressed, SURVEY.md section 3.4),
windowed aggregations, watermarked dedup, and arbitrary stateful operators.
"""
