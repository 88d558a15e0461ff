"""OpenAI-compatible HTTP serving layer.

TPU-native counterpart of the reference's ``server`` crate (SURVEY.md §2.1):
axum → aiohttp, utoipa Swagger → a served OpenAPI JSON, SSE streaming, the
JSON-schema validation endpoint, chat-template rendering per model family,
and (beyond the reference, which never installs its exporter) live Prometheus
metrics.
"""
