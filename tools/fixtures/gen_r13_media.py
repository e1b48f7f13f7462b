#!/usr/bin/env python3
"""Round-13 media fixture generator (throwaway, kept for re-pinning):
 - dialog_h_16.wav : 16-bit MONO twin of dialog_h.pcm (canonical-equal)
 - duet_s8.wav     : 8-bit STEREO, fresh signal (L/R mean = canonical)
 - organ_24.wav    : 24-bit PCM — structurally valid, format-REJECTED
 - vid_duet.avi    : AVI with 16-bit STEREO interleaved audio
 - vid_wall.avi    : movi with >4096 sub-chunks (walk-cap audit)
Prints the spec-pin numbers (canonical energies, header fields,
frame sums)."""
import struct, os

D = '/root/repo/src/main/resources/meta/media'

def _existing_sums():
    def walk(b, st, en):
        out, p, i = [], st, 0
        while p + 8 <= en and i < 4096:
            cid = b[p:p+4]; sz = struct.unpack('<I', b[p+4:p+8])[0]
            out.append((p, cid, sz)); p += 8 + sz + (sz & 1); i += 1
        return out
    sums = set()
    for f in os.listdir(D):
        b = open(os.path.join(D, f), 'rb').read()
        if f.endswith('.avi') and f not in ('vid_duet.avi', 'vid_wall.avi'):
            for p, cid, sz in walk(b, 12, len(b)):
                if cid == b'LIST' and b[p+8:p+12] == b'movi':
                    for p2, cid2, sz2 in walk(b, p + 12, p + 8 + sz):
                        if cid2 == b'00db':
                            sums.add(sum(b[p2+8:p2+8+sz2]))
        if f.endswith('.gvid'):
            fs, nf = struct.unpack('<HH', b[4:8])
            for i in range(nf):
                sums.add(sum(b[8+i*fs:8+(i+1)*fs]))
    return sums

EXISTING = _existing_sums()

def chunk(cid, data):
    pad = b'\x00' if len(data) % 2 else b''
    return cid + struct.pack('<I', len(data)) + data + pad

def lst(form, payload):
    return chunk(b'LIST', form + payload)

def wav(fmt, ch, sr, bits, payload):
    ba = ch * (bits // 8)
    br = sr * ba
    f = struct.pack('<HHIIHH', fmt, ch, sr, br, ba, bits)
    body = b'WAVE' + chunk(b'fmt ', f) + chunk(b'data', payload)
    return b'RIFF' + struct.pack('<I', len(body)) + body

def avih(uspf, frames, streams, w, h):
    a = struct.pack('<IIII', uspf, 0, 0, 0)
    a += struct.pack('<IIII', frames, 0, streams, 0)
    a += struct.pack('<II', w, h)
    a += struct.pack('<IIII', 0, 0, 0, 0)
    assert len(a) == 56
    return chunk(b'avih', a)

def strh(fcc):
    return chunk(b'strh', fcc + b'\x00' * 52)

def strf_audio(fmt, ch, sr, bits):
    ba = ch * (bits // 8)
    return chunk(b'strf', struct.pack('<HHIIHH', fmt, ch, sr, sr * ba,
                                      ba, bits))

def strf_video():
    return chunk(b'strf', b'\x00' * 40)

def avi(uspf, frames, w, h, strls, movi_chunks):
    hdrl = lst(b'hdrl', avih(uspf, frames, 2, w, h) + strls)
    movi = lst(b'movi', b''.join(movi_chunks))
    body = b'AVI ' + hdrl + movi
    return b'RIFF' + struct.pack('<I', len(body)) + body

def energies(canon):
    return [sum((b - 128) ** 2 for b in canon[f*64:(f+1)*64])
            for f in range(len(canon) // 64)]

def segs(es):
    out, start = [], None
    for i, e in enumerate(es):
        if e >= 4096 and start is None:
            start = i
        if e < 4096 and start is not None:
            out.append((start, i - 1)); start = None
    if start is not None:
        out.append((start, len(es) - 1))
    return out

# ---- dialog_h_16.wav: canonical-equal 16-bit twin --------------------
src = open(os.path.join(D, 'dialog_h.pcm'), 'rb').read()
pay = bytearray()
for i, s8 in enumerate(src):
    u16 = s8 * 256 + (i * 37) % 256     # low byte < 256: canon byte = s8
    pay += struct.pack('<H', (u16 - 32768) % 65536)  # signed LE
open(os.path.join(D, 'dialog_h_16.wav'), 'wb').write(
    wav(1, 1, 8000, 16, bytes(pay)))
print('dialog_h_16: payload', len(pay), 'canon==dialog_h:',
      bytes((struct.unpack('<h', pay[2*i:2*i+2])[0] + 32768) >> 8
            for i in range(len(pay)//2)) == src)

# ---- duet_s8.wav: 8-bit stereo, fresh signal -------------------------
canon = bytearray()
for f in range(32):
    amp = 0 if (f < 8 or f >= 28) else 20 + (f % 4) * 10
    for i in range(64):
        canon.append(128 + (amp if i % 2 == 0 else -amp))
pay = bytearray()
for c in canon:
    pay += bytes([min(255, c + 5), c - 5])      # (L+R)//2 == c
open(os.path.join(D, 'duet_s8.wav'), 'wb').write(
    wav(1, 2, 8000, 8, bytes(pay)))
es = energies(canon)
print('duet_s8: canon', len(canon), 'n_silent',
      sum(1 for e in es if e < 4096), 'of', len(es),
      'ppm', 1000000 * sum(1 for e in es if e < 4096) // len(es),
      'segs', segs(es), 'peak', max(es))

# ---- organ_24.wav: valid container, rejected sample format -----------
pay = bytes((i * 7 + j) % 256 for i in range(512) for j in range(3))
open(os.path.join(D, 'organ_24.wav'), 'wb').write(
    wav(1, 1, 8000, 24, pay))
print('organ_24: payload', len(pay))

# ---- hymn_x.wav: WAVE_FORMAT_EXTENSIBLE, 16-bit stereo ---------------
PCM_GUID = bytes.fromhex('0100000000001000800000AA00389B71')

def wav_ext(ch, sr, bits, payload):
    ba = ch * (bits // 8)
    f = struct.pack('<HHIIHH', 0xFFFE, ch, sr, sr * ba, ba, bits)
    f += struct.pack('<HHI', 22, bits, (1 << ch) - 1) + PCM_GUID
    assert len(f) == 40
    body = b'WAVE' + chunk(b'fmt ', f) + chunk(b'data', payload)
    return b'RIFF' + struct.pack('<I', len(body)) + body

canon = bytearray()
for f in range(66):
    amp = 0 if (f < 3 or f >= 63) else 15 + (f % 6) * 9
    for i in range(64):
        canon.append(128 + (amp if i % 2 == 0 else -amp))
pay = bytearray()
for c in canon:
    uL, uR = c * 256 + 33, c * 256 + 77      # mean top byte = c
    pay += struct.pack('<HH', (uL - 32768) % 65536, (uR - 32768) % 65536)
open(os.path.join(D, 'hymn_x.wav'), 'wb').write(
    wav_ext(2, 8000, 16, bytes(pay)))
es = energies(canon)
print('hymn_x: raw', len(pay), 'canon', len(canon), 'frames', len(es),
      'n_silent', sum(1 for e in es if e < 4096),
      'ppm', 1000000 * sum(1 for e in es if e < 4096) // len(es),
      'segs', segs(es))

# ---- vid_duet.avi: 16-bit stereo interleaved audio -------------------
canon = bytearray()
for f in range(65):
    amp = 0 if (f < 2 or f >= 63) else 20 + (f % 5) * 10
    for i in range(64):
        canon.append(128 + (amp if i % 2 == 0 else -amp))
raw = bytearray()
for c in canon:
    uL, uR = c * 256 + 17, c * 256 + 91     # mean = c*256+54 -> top byte c
    raw += struct.pack('<HH', (uL - 32768) % 65536, (uR - 32768) % 65536)
# two unique 6x3 video frames (sums distinct from every existing one)
fr0 = bytes([200, 201, 202, 203, 204, 205] * 3)          # sum 3645
fr1 = bytes([10, 30, 50, 70, 90, 110] * 3)               # sum 1080
assert sum(fr0) not in EXISTING and sum(fr1) not in EXISTING
cut = len(raw) // 3
movi = [chunk(b'00db', fr0), chunk(b'01wb', bytes(raw[:cut])),
        chunk(b'00db', fr1), chunk(b'01wb', bytes(raw[cut:2*cut])),
        chunk(b'01wb', bytes(raw[2*cut:]))]
strls = (lst(b'strl', strh(b'vids') + strf_video()) +
         lst(b'strl', strh(b'auds') + strf_audio(1, 2, 8000, 16)))
open(os.path.join(D, 'vid_duet.avi'), 'wb').write(
    avi(40000, 2, 6, 3, strls, movi))
es = energies(canon)
print('vid_duet: raw', len(raw), 'canon', len(canon), 'frames', len(es),
      'n_silent', sum(1 for e in es if e < 4096),
      'ppm', 1000000 * sum(1 for e in es if e < 4096) // len(es),
      'segs', segs(es), 'fr_sums', sum(fr0), sum(fr1))

# ---- vid_wall.avi: movi walk-cap fixture -----------------------------
fr0 = bytes([60, 61, 62, 63, 64, 65] * 3)                # sum 1125
fr1 = bytes([140, 141, 142, 143, 144, 145] * 3)          # sum 2565
assert sum(fr0) not in EXISTING and sum(fr1) not in EXISTING
movi = [chunk(b'00db', fr0), chunk(b'00db', fr1)]
for k in range(4100):
    movi.append(chunk(b'01wb', bytes([(k % 2) * 255, 128])))
strls = (lst(b'strl', strh(b'vids') + strf_video()) +
         lst(b'strl', strh(b'auds') + strf_audio(1, 1, 8000, 8)))
b = avi(40000, 2, 6, 3, strls, movi)
open(os.path.join(D, 'vid_wall.avi'), 'wb').write(b)
print('vid_wall: total', len(b), 'movi chunks', len(movi),
      'fr_sums', sum(fr0), sum(fr1))

# ---- X32.bmp: 32-bpp BI_RGB silhouette (round-13 image widening) ----
SIL = '/root/repo/src/main/resources/meta/silhouettes'

def bmp32(w, h, px):
    """px(x, y) -> (B, G, R); writes bottom-up BI_RGB 32-bpp."""
    stride = w * 4                      # already 4-aligned
    size = 54 + h * stride
    hdr = b'BM' + struct.pack('<IHHI', size, 0, 0, 54)
    hdr += struct.pack('<IiiHHIIiiII', 40, w, h, 1, 32, 0,
                       h * stride, 2835, 2835, 0, 0)
    body = bytearray()
    for row in range(h):                # bottom-up: row 0 = image bottom
        y = h - 1 - row
        for x in range(w):
            b_, g_, r_ = px(x, y)
            body += bytes([b_, g_, r_, 0])
    return hdr + bytes(body)

def x32px(x, y):
    # high-contrast deterministic pattern (passes the flat-image gate)
    return ((x * 29 + y * 53) % 256, (x * 71 + y * 13) % 256,
            (x * 17 + y * 97) % 256)

open(os.path.join(SIL, 'X32.bmp'), 'wb').write(bmp32(85, 20, x32px))
print('X32.bmp written: 85x20 32-bpp BI_RGB,',
      os.path.getsize(os.path.join(SIL, 'X32.bmp')), 'bytes')

# ---- phone_u.wav / fax_a.wav: G.711 u-law / A-law telephony audio ----
def ulaw_dec(u):
    v = ~u & 0xFF
    mag = ((((v & 0xF) << 3) + 0x84) << ((v >> 4) & 7)) - 0x84
    return -mag if (v & 0x80) else mag

def alaw_dec(a):
    v = (a ^ 0x55) & 0xFF
    exp = (v >> 4) & 7; man = v & 0xF
    mag = (man << 4) + 8 if exp == 0 else ((man << 4) + 0x108) << (exp - 1)
    return mag if (v & 0x80) else -mag

def g711_report(name, pay, dec):
    canon = bytes(((dec(b) + 32768) >> 8) for b in pay)
    es = energies(canon)
    print(name, 'payload', len(pay), 'n_silent',
          sum(1 for e in es if e < 4096), 'of', len(es),
          'ppm', 1000000 * sum(1 for e in es if e < 4096) // len(es),
          'segs', segs(es))

pay = bytearray()
for f in range(24):
    for i in range(64):
        if f < 4 or f >= 20:
            pay.append(0xFF)                     # linear 0 -> silent
        else:
            pos, neg = 0xA0 - (f % 4), 0x20 + (f % 4)
            pay.append(pos if i % 2 == 0 else neg)
open(os.path.join(D, 'phone_u.wav'), 'wb').write(
    wav(7, 1, 8000, 8, bytes(pay)))
g711_report('phone_u:', pay, ulaw_dec)

pay = bytearray()
for f in range(24):
    for i in range(64):
        if f < 5 or f >= 19:
            pay.append(0x55)                     # linear -8 -> silent
        else:
            pos, neg = 0xAA - (f % 3), 0x2A + (f % 3)
            pay.append(pos if i % 2 == 0 else neg)
open(os.path.join(D, 'fax_a.wav'), 'wb').write(
    wav(6, 1, 8000, 8, bytes(pay)))
g711_report('fax_a:', pay, alaw_dec)
