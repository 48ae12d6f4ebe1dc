"""Typed errors for the KV layer."""


class NoRewriteViolated(Exception):
    """Raised when a no-rewrite-protected key would be overwritten
    (reference server.go:22 ErrNoRewriteViolated -> HTTP 423). The message
    names the first conflicting key, like the reference's
    fmt.Errorf("%w: %s", ErrNoRewriteViolated, k)."""


class CommitConflict(Exception):
    """Raised when the put-if-absent commit lost too many races in a row
    (the engine's analogue of the reference's 412 on .potlock contention,
    server.go:670-689 — except we retry with fresh state instead of
    failing fast, because the conflict probe re-runs on every attempt)."""
