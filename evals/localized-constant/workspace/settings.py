# Service configuration.
RETRY_LIMIT = 3
TIMEOUT_S = 20
