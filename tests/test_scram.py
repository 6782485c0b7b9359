"""sources/scram.py against the PUBLISHED RFC vectors — independent
truth for the auth math both the PG walsender and Kafka SASL paths now
share. RFC 7677 §3 gives a complete SCRAM-SHA-256 exchange (user
"user", password "pencil", fixed nonces); every byte of the client's
two messages and the server-signature check are pinned to it."""

from __future__ import annotations

import pytest

from synch_spark.sources.scram import ScramClient, saslname


def test_rfc7677_sha256_full_exchange_pinned():
    c = ScramClient("user", "pencil", "sha256",
                    nonce="rOprNGfwEbeRWgbNEkqO")
    assert c.first_message() == b"n,,n=user,r=rOprNGfwEbeRWgbNEkqO"
    server_first = (b"r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
                    b"s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096")
    assert c.final_message(server_first) == (
        b"c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        b"p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    # the RFC's server-final verifies; a flipped signature does not
    c.verify_final(b"v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    with pytest.raises(ValueError, match="signature"):
        c.verify_final(b"v=7rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")


def test_server_nonce_must_extend_client_nonce():
    c = ScramClient("u", "p", "sha256", nonce="abc")
    with pytest.raises(ValueError, match="nonce"):
        c.final_message(b"r=XYZdef,s=c2FsdA==,i=4096")


def test_saslname_escaping_round_trips_through_first_message():
    c = ScramClient("we=ird,user", "p", "sha512", nonce="n1")
    assert c.first_message() == b"n,,n=we=3Dird=2Cuser,r=n1"
    assert saslname("plain") == "plain"


def test_verify_before_final_message_rejected():
    c = ScramClient("u", "p", "sha256")
    with pytest.raises(ValueError, match="signature"):
        c.verify_final(b"v=AAAA")
