#!/usr/bin/env python3
"""Encrypted-PDF fixtures for PdfTextSpec — the ISO 32000-1 §7.6 standard
security handler implemented from the PUBLIC spec (hashlib MD5 + hand
RC4 + AES-CBC via `cryptography`), independent of the Scala decryptor.

Fixtures (all share the same two pages of text):
  pdf_enc_plain.pdf     unencrypted twin (the expected text source)
  pdf_enc_rc4_40.pdf    V1 R2, RC4-40, empty user password
  pdf_enc_rc4_128.pdf   V2 R3, RC4-128 (/Length 128), empty user password
  pdf_enc_aesv2.pdf     V4 R4, /CFM /AESV2 (AES-128-CBC), empty user pw
  pdf_enc_v4_rc4.pdf    V4 R4, /CFM /V2 (RC4 through a crypt filter)
  pdf_enc_password.pdf  V2 R3 with user password "secret" → must refuse
  pdf_enc_aes256_r6.pdf V5 R6, /CFM /AESV3 (ISO 32000-2 Algorithm 2.B),
                        empty user password, /Perms present
  pdf_enc_aes256_r5.pdf V5 R5 (Adobe pre-ISO single-SHA-256), empty user pw
  pdf_enc_aes256_pw.pdf V5 R6 with user password "secret" → must refuse

Run from repo root: python3 tools/make_pdf_encrypted_fixture.py
"""
import hashlib
import os
import struct
import zlib

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "fixtures")

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A])


def pad_pwd(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    x = y = 0
    for b in data:
        x = (x + 1) & 0xFF
        y = (y + s[x]) & 0xFF
        s[x], s[y] = s[y], s[x]
        out.append(b ^ s[(s[x] + s[y]) & 0xFF])
    return bytes(out)


def compute_O(owner_pwd: bytes, user_pwd: bytes, r: int, n: int) -> bytes:
    h = hashlib.md5(pad_pwd(owner_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    okey = h[:n]
    x = rc4(okey, pad_pwd(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            x = rc4(bytes(b ^ i for b in okey), x)
    return x


def file_key(user_pwd: bytes, o_entry: bytes, p: int, id0: bytes,
             r: int, n: int) -> bytes:
    h = hashlib.md5(pad_pwd(user_pwd) + o_entry
                    + struct.pack("<i", p) + id0).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def compute_U(key: bytes, id0: bytes, r: int) -> bytes:
    if r == 2:
        return rc4(key, PAD)
    x = rc4(key, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x + b"\x00" * 16


def obj_key(key: bytes, num: int, gen: int, aes: bool) -> bytes:
    d = (key + struct.pack("<i", num)[:3] + struct.pack("<i", gen)[:2]
         + (b"sAlT" if aes else b""))
    return hashlib.md5(d).digest()[:min(len(key) + 5, 16)]


def hash_2b(pwd: bytes, salt: bytes, udata: bytes, r: int) -> bytes:
    """ISO 32000-2 Algorithm 2.B (r=6); r=5 is the plain SHA-256 prefix."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    if r == 5:
        return k
    count = 0
    while True:
        count += 1
        k1 = (pwd + k + udata) * 64
        enc = Cipher(algorithms.AES(k[:16]), modes.CBC(k[16:32])).encryptor()
        e = enc.update(k1) + enc.finalize()
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        if count >= 64 and e[-1] <= count - 32:
            return k[:32]


def aes_cbc_raw(key: bytes, iv: bytes, data: bytes, decrypt=False) -> bytes:
    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    op = c.decryptor() if decrypt else c.encryptor()
    return op.update(data) + op.finalize()


def v5_entries(user_pwd: bytes, owner_pwd: bytes, file_key: bytes,
               p: int, r: int):
    """(/U, /UE, /O, /OE, /Perms) for the V5 handler, salts fixed."""
    uvs, uks = bytes(range(8)), bytes(range(8, 16))
    ovs, oks = bytes(range(16, 24)), bytes(range(24, 32))
    u = hash_2b(user_pwd, uvs, b"", r) + uvs + uks
    ue = aes_cbc_raw(hash_2b(user_pwd, uks, b"", r), bytes(16), file_key)
    o = hash_2b(owner_pwd, ovs, u, r) + ovs + oks
    oe = aes_cbc_raw(hash_2b(owner_pwd, oks, u, r), bytes(16), file_key)
    perms_plain = (struct.pack("<i", p) + b"\xff\xff\xff\xff" + b"T"
                   + b"adb" + b"seed")
    enc = Cipher(algorithms.AES(file_key), modes.ECB()).encryptor()
    perms = enc.update(perms_plain) + enc.finalize()
    return u, ue, o, oe, perms


def aes_encrypt(okey: bytes, data: bytes, iv: bytes) -> bytes:
    padn = 16 - len(data) % 16
    enc = Cipher(algorithms.AES(okey), modes.CBC(iv)).encryptor()
    return iv + enc.update(data + bytes([padn]) * padn) + enc.finalize()


PAGE1 = b"""BT
/F1 12 Tf
72 720 Td
(Encrypted page one: fee schedule \\(v2\\)) Tj
0 -14 Td
(rates: 1.5% + <fixed>) Tj
ET"""

PAGE2 = b"""BT
/F1 12 Tf
72 720 Td
(Second page, deflated then ciphered.) Tj
0 -14 Td
(All bytes must round the RC4/AES trip.) Tj
ET"""


def build(path, enc_dict=None, key=None, aes=False, id0=b"", v5=False):
    """Assemble the fixture; when key is set, strings+streams encrypt."""
    def crypt(num, body):
        if key is None:
            return body
        ok = key if v5 else obj_key(key, num, 0, aes)
        if aes:
            iv = hashlib.md5(path.encode() + bytes([num])).digest()  # fixed per object
            return aes_encrypt(ok, body, iv)
        return rc4(ok, body)

    s4 = crypt(4, PAGE1)
    s6 = crypt(6, zlib.compress(PAGE2))
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length %d >>\nstream\n" % len(s4) + s4 + b"\nendstream",
        5: b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
        6: b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(s6)
           + s6 + b"\nendstream",
    }
    if enc_dict is not None:
        objs[7] = enc_dict
    out = bytearray(b"%PDF-1.6\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (max(objs) + 1)
    out += b"0000000000 65535 f \n"
    for num in sorted(objs):
        out += b"%010d 00000 n \n" % offsets[num]
    trailer = b"<< /Size %d /Root 1 0 R" % (max(objs) + 1)
    if enc_dict is not None:
        trailer += b" /Encrypt 7 0 R"
    if id0:
        trailer += b" /ID [<%s> <%s>]" % (id0.hex().encode(), id0.hex().encode())
    trailer += b" >>"
    out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_at
    with open(os.path.join(OUT, path), "wb") as f:
        f.write(bytes(out))


def pdf_str(b: bytes) -> bytes:
    """Hex-string form (escape-free and unambiguous)."""
    return b"<" + b.hex().encode() + b">"


def main():
    os.makedirs(OUT, exist_ok=True)
    id0 = bytes.fromhex("8f3a1c44b2d9e07156ccad0192837465")
    p = -44

    build("pdf_enc_plain.pdf", id0=id0)

    # V1 R2: RC4-40
    o = compute_O(b"owner", b"", 2, 5)
    k = file_key(b"", o, p, id0, 2, 5)
    u = compute_U(k, id0, 2)
    build("pdf_enc_rc4_40.pdf",
          b"<< /Filter /Standard /V 1 /R 2 /O " + pdf_str(o)
          + b" /U " + pdf_str(u) + b" /P %d >>" % p,
          key=k, id0=id0)

    # V2 R3: RC4-128
    o = compute_O(b"owner", b"", 3, 16)
    k = file_key(b"", o, p, id0, 3, 16)
    u = compute_U(k, id0, 3)
    build("pdf_enc_rc4_128.pdf",
          b"<< /Filter /Standard /V 2 /R 3 /Length 128 /O " + pdf_str(o)
          + b" /U " + pdf_str(u) + b" /P %d >>" % p,
          key=k, id0=id0)

    # V4 R4: AESV2 crypt filter
    o = compute_O(b"owner", b"", 4, 16)
    k = file_key(b"", o, p, id0, 4, 16)
    u = compute_U(k, id0, 4)
    build("pdf_enc_aesv2.pdf",
          b"<< /Filter /Standard /V 4 /R 4 /Length 128"
          b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >>"
          b" /StmF /StdCF /StrF /StdCF /O " + pdf_str(o)
          + b" /U " + pdf_str(u) + b" /P %d >>" % p,
          key=k, aes=True, id0=id0)

    # V4 R4: RC4 through a crypt filter (/CFM /V2)
    build("pdf_enc_v4_rc4.pdf",
          b"<< /Filter /Standard /V 4 /R 4 /Length 128"
          b" /CF << /StdCF << /CFM /V2 /AuthEvent /DocOpen /Length 16 >> >>"
          b" /StmF /StdCF /StrF /StdCF /O " + pdf_str(o)
          + b" /U " + pdf_str(u) + b" /P %d >>" % p,
          key=k, id0=id0)

    # V2 R3 with a REAL user password: must stay refused
    o = compute_O(b"owner", b"secret", 3, 16)
    k = file_key(b"secret", o, p, id0, 3, 16)
    u = compute_U(k, id0, 3)
    build("pdf_enc_password.pdf",
          b"<< /Filter /Standard /V 2 /R 3 /Length 128 /O " + pdf_str(o)
          + b" /U " + pdf_str(u) + b" /P %d >>" % p,
          key=k, id0=id0)

    # V5 R6: AES-256 via Algorithm 2.B, empty user password
    fk = bytes.fromhex(
        "00112233445566778899aabbccddeeff0f1e2d3c4b5a69788796a5b4c3d2e1f0")
    u, ue, o, oe, perms = v5_entries(b"", b"owner", fk, p, 6)
    enc = (b"<< /Filter /Standard /V 5 /R 6 /Length 256"
           b" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >>"
           b" /StmF /StdCF /StrF /StdCF"
           b" /O " + pdf_str(o) + b" /OE " + pdf_str(oe)
           + b" /U " + pdf_str(u) + b" /UE " + pdf_str(ue)
           + b" /Perms " + pdf_str(perms) + b" /P %d >>" % p)
    build("pdf_enc_aes256_r6.pdf", enc, key=fk, aes=True, id0=id0, v5=True)

    # V5 R5: the pre-ISO single-SHA-256 revision; /UE listed BEFORE /U to
    # exercise the name-boundary lookup (no /Perms — some R5 writers omit it)
    fk5 = bytes.fromhex(
        "f0e1d2c3b4a5968778695a4b3c2d1e0fff00ee11dd22cc33bb44aa5599668877")
    u, ue, o, oe, _ = v5_entries(b"", b"owner", fk5, p, 5)
    enc = (b"<< /Filter /Standard /V 5 /R 5 /Length 256"
           b" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >>"
           b" /StmF /StdCF /StrF /StdCF"
           b" /UE " + pdf_str(ue) + b" /U " + pdf_str(u)
           + b" /OE " + pdf_str(oe) + b" /O " + pdf_str(o)
           + b" /P %d >>" % p)
    build("pdf_enc_aes256_r5.pdf", enc, key=fk5, aes=True, id0=id0, v5=True)

    # V5 R6 with a REAL user password: must stay refused
    u, ue, o, oe, perms = v5_entries(b"secret", b"owner", fk, p, 6)
    enc = (b"<< /Filter /Standard /V 5 /R 6 /Length 256"
           b" /CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >>"
           b" /StmF /StdCF /StrF /StdCF"
           b" /O " + pdf_str(o) + b" /OE " + pdf_str(oe)
           + b" /U " + pdf_str(u) + b" /UE " + pdf_str(ue)
           + b" /Perms " + pdf_str(perms) + b" /P %d >>" % p)
    build("pdf_enc_aes256_pw.pdf", enc, key=fk, aes=True, id0=id0, v5=True)

    print("encrypted pdf fixtures written to", OUT)


if __name__ == "__main__":
    main()
