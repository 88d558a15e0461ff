"""User-facing entrypoints: offline batch generation + the HTTP server."""
