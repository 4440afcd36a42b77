"""TestSignatureFactory / TestTextProfileSignature analogues."""

import hashlib

from coherencebot_ray.functions.signatures import (
    make_signer,
    md5_signature,
    text_md5_signature,
    text_profile_signature,
)


def test_md5_signature_content_and_fallback():
    assert md5_signature(b"hello") == hashlib.md5(b"hello").digest()
    assert md5_signature(None, "http://a.com/") == hashlib.md5(b"http://a.com/").digest()
    assert md5_signature(b"", "http://a.com/") == hashlib.md5(b"http://a.com/").digest()


def test_text_md5():
    assert text_md5_signature("body text") == hashlib.md5("body text".encode()).digest()
    assert text_md5_signature(None, b"raw") == hashlib.md5(b"raw").digest()


def test_text_profile_known_value():
    # tokens len>2, lowercased; profile sorted by (freq desc, token asc),
    # QUANT=1 (maxFreq=1): "aaa 1\nbbb 1" per the documented algorithm
    sig = text_profile_signature("Aaa bbb")
    assert sig == hashlib.md5(b"aaa 1\nbbb 1").digest()
    # maxFreq=2 => QUANT=2, so the once-seen token is quantized away
    sig2 = text_profile_signature("xxx yyy xxx")
    assert sig2 == hashlib.md5(b"xxx 2").digest()
    # three tokens with equal freq => all kept, sorted lexicographically
    sig3 = text_profile_signature("ccc aaa bbb")
    assert sig3 == hashlib.md5(b"aaa 1\nbbb 1\nccc 1").digest()


def test_text_profile_near_dup_robustness():
    # word order / punctuation / case changes do not change the signature
    a = text_profile_signature("The quick brown fox jumps over the lazy dog!")
    b = text_profile_signature("quick BROWN fox; the lazy dog jumps over the")
    assert a == b
    c = text_profile_signature("a completely different document body")
    assert a != c


def test_text_profile_quantization():
    # maxFreq=10 => QUANT=max(2, round(10*0.01)) = 2: below-QUANT terms dropped
    text = " ".join(["common"] * 10 + ["rare"])
    sig = text_profile_signature(text)
    assert sig == hashlib.md5(b"common 10").digest()


def test_text_profile_fallback_to_content():
    assert text_profile_signature("", b"content") == hashlib.md5(b"content").digest()


def test_factory():
    assert make_signer("md5")(None, b"x", "u") == hashlib.md5(b"x").digest()
    assert make_signer("text_md5")("t", b"x", "u") == hashlib.md5(b"t").digest()
    assert make_signer("text_profile")("Aaa bbb", None, "u") == hashlib.md5(b"aaa 1\nbbb 1").digest()
