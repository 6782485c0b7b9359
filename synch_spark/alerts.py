"""Error alerting (E6) — stdlib-faithful rebuild of the reference's
SMTP error channel (/root/reference/synch/factory.py:113-126): a
``logging.handlers.SMTPHandler`` attached at ERROR level with a
rate-limiting filter (one mail per ``per`` seconds, extra records
dropped with a counter), driven by the same ``mail:`` config block
(mailhost/fromaddr/toaddrs/subject/user/password).

Nothing here needs a network until an ERROR record actually fires;
construction and the rate limiter are contract-tested offline."""

from __future__ import annotations

import logging
import logging.handlers
import time


class RateLimitingFilter(logging.Filter):
    """Pass at most one record per ``per`` seconds; suppressed records
    are counted and the count is prefixed to the next passed record so
    no failure goes entirely unreported (the reference uses
    logging_ratelimiter with the same policy)."""

    def __init__(self, per: float = 60.0):
        super().__init__()
        import threading

        self.per = per
        # None, not 0.0: CLOCK_MONOTONIC can start near 0 (fresh
        # VM/WSL), and `monotonic() - 0.0 >= per` would then suppress
        # the FIRST error — often the only alert before a crash
        self._last: float | None = None
        self._suppressed = 0
        # logging runs handler filters from many driver threads; without
        # the lock two racers both pass (double mail) or lose suppressed
        # increments (under-reported drop count)
        self._lock = threading.Lock()

    def filter(self, record: logging.LogRecord) -> bool:
        now = time.monotonic()
        with self._lock:
            if self._last is None or now - self._last >= self.per:
                if self._suppressed:
                    # NEVER mutate record.msg: the record object is
                    # shared with every other handler on the logger, so
                    # an in-place prefix would leak '[N suppressed]'
                    # into console/file output that suppressed nothing.
                    # The annotation rides as an attribute; only the
                    # SMTP handler's emit renders it (on a COPY).
                    record._synch_suppressed = self._suppressed
                    self._suppressed = 0
                self._last = now
                return True
            self._suppressed += 1
            return False


class _AnnotatingSMTPHandler(logging.handlers.SMTPHandler):
    """Renders the rate-limiter's suppressed count into the MAIL ONLY,
    on a private copy of the record (see RateLimitingFilter.filter)."""

    def emit(self, record: logging.LogRecord) -> None:
        n = getattr(record, "_synch_suppressed", 0)
        if n:
            record = logging.makeLogRecord(record.__dict__)
            record.msg = f"[{n} suppressed] {record.msg}"
        super().emit(record)


def build_smtp_handler(mail: dict) -> logging.Handler:
    """SMTPHandler from a reference-shaped ``mail`` config dict."""
    creds = None
    if mail.get("user"):
        creds = (mail.get("user"), mail.get("password"))
    h = _AnnotatingSMTPHandler(
        mailhost=mail["mailhost"],
        fromaddr=mail["fromaddr"],
        toaddrs=mail["toaddrs"],
        subject=mail.get("subject", "synch-spark error"),
        credentials=creds,
    )
    h.setLevel(logging.ERROR)
    h.addFilter(RateLimitingFilter(per=float(mail.get("rate_limit_s", 60))))
    return h


def configure_alerts(
    mail: dict | None, logger: logging.Logger | None = None
) -> logging.Logger:
    """Attach the SMTP error channel to the engine logger (idempotent:
    an existing SMTPHandler is replaced, not duplicated). With
    ``mail=None`` just returns the logger — alerting is opt-in exactly
    like the reference's Settings.get('mail')."""
    log = logger or logging.getLogger("synch_spark")
    if mail:
        for h in [h for h in log.handlers
                  if isinstance(h, logging.handlers.SMTPHandler)]:
            log.removeHandler(h)
        log.addHandler(build_smtp_handler(mail))
    return log
