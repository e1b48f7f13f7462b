#!/usr/bin/env python3
"""Round-14 media fixture generator (kept for re-pinning):
 - bell_r64.wav  : RF64/BWF (EBU Tech 3306) 16-bit mono PCM — the
   64-bit WAV admission fixture: 'RF64' magic, 32-bit size fields
   hold the 0xFFFFFFFF placeholder, real sizes live in the ds64
   chunk. Payload is a fresh mono signal (silent rims for mm11/mm13).
 - flute_f32.wav : IEEE float PCM (format 3, 32-bit mono) — the
   engine-exact float->int admission fixture. Samples are k/32768
   floats chosen so the documented floor(clamp(x)*32767) rule lands
   on designed canonical bytes.
Prints the spec-pin numbers (canonical frame counts, silent shares,
segments) the enumerated-set specs assert."""
import struct, os

D = '/root/repo/src/main/resources/meta/media'


def chunk(cid, data):
    pad = b'\x00' if len(data) % 2 else b''
    return cid + struct.pack('<I', len(data)) + data + pad


def wav(fmt, ch, sr, bits, payload):
    ba = ch * (bits // 8)
    br = sr * ba
    f = struct.pack('<HHIIHH', fmt, ch, sr, br, ba, bits)
    body = b'WAVE' + chunk(b'fmt ', f) + chunk(b'data', payload)
    return b'RIFF' + struct.pack('<I', len(body)) + body


def wav_rf64(ch, sr, bits, payload):
    """RF64: 32-bit riff/data sizes = 0xFFFFFFFF, real u64 sizes in
    ds64 (riffSize @0, dataSize @8, sampleCount @16, table_len @24).
    data must be the last chunk (the walk cannot advance past the
    placeholder size)."""
    ba = ch * (bits // 8)
    f = struct.pack('<HHIIHH', 1, ch, sr, sr * ba, ba, bits)
    ds64 = struct.pack('<QQQI', 0, len(payload), len(payload) // ba, 0)
    body = (b'WAVE' + chunk(b'ds64', ds64) + chunk(b'fmt ', f) +
            b'data' + struct.pack('<I', 0xFFFFFFFF) + payload)
    blob = bytearray(b'RF64' + struct.pack('<I', 0xFFFFFFFF) + body)
    blob[20:28] = struct.pack('<Q', len(blob) - 8)  # ds64.riffSize
    return bytes(blob)


def energies(canon):
    return [sum((b - 128) ** 2 for b in canon[f * 64:(f + 1) * 64])
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


def f32_to_v16(u32):
    """The engine's exact integer decode (Pcm.f32ToV16 twin)."""
    neg = (u32 >> 31) != 0
    e = (u32 >> 23) & 0xFF
    m = u32 & 0x7FFFFF
    if e == 255:
        return 0 if m else (-32767 if neg else 32767)
    if e >= 127:
        return -32767 if neg else 32767
    if e <= 87:
        return -1 if (neg and (m > 0 or e > 0)) else 0
    num = (m | 0x800000) * 32767
    k = 150 - e
    return -((num + (1 << k) - 1) >> k) if neg else num >> k


def report(name, canon):
    es = energies(canon)
    print(name, 'canon', len(canon), 'frames', len(es),
          'n_silent', sum(1 for e in es if e < 4096),
          'ppm', 1000000 * sum(1 for e in es if e < 4096) // len(es),
          'segs', [(a, b, b - a + 1) for a, b in segs(es)],
          'seg_peaks', [max(es[a:b + 1]) for a, b in segs(es)])


# ---- bell_r64.wav: RF64 16-bit mono ---------------------------------
canon = bytearray()
for f in range(70):
    amp = 0 if (f < 4 or f >= 65) else 18 + (f % 7) * 7
    for i in range(64):
        canon.append(128 + (amp if i % 2 == 0 else -amp))
pay = bytearray()
for i, c in enumerate(canon):
    u16 = c * 256 + 53                      # top byte = c
    pay += struct.pack('<H', (u16 - 32768) % 65536)
blob = wav_rf64(1, 8000, 16, bytes(pay))
open(os.path.join(D, 'bell_r64.wav'), 'wb').write(blob)
got = bytes((struct.unpack('<h', pay[2 * i:2 * i + 2])[0] + 32768) >> 8
            for i in range(len(pay) // 2))
print('bell_r64: file', len(blob), 'payload', len(pay),
      'riff_bytes(ds64)', len(blob) - 8,
      'canon==designed:', got == bytes(canon))
report('bell_r64', canon)

# ---- flute_f32.wav: IEEE float32 mono -------------------------------
canon = bytearray()
for f in range(68):
    amp = 0 if (f < 3 or f >= 64) else 16 + (f % 8) * 5
    for i in range(64):
        canon.append(128 + (amp if i % 2 == 0 else -amp))
pay = bytearray()
for c in canon:
    k = (c - 128) * 256 + 100               # x = k/32768 exactly
    pay += struct.pack('<f', k / 32768.0)
blob = wav(3, 1, 8000, 32, bytes(pay))
open(os.path.join(D, 'flute_f32.wav'), 'wb').write(blob)
got = bytes((f32_to_v16(struct.unpack('<I', pay[4 * i:4 * i + 4])[0])
             + 32768) >> 8 for i in range(len(pay) // 4))
print('flute_f32: file', len(blob), 'payload', len(pay),
      'canon==designed:', got == bytes(canon))
report('flute_f32', canon)

# ---- vid_duet_c.avi: byte-identical re-upload of vid_duet ----------
# The FULL-DUP fixture for mm22's container-pair verdict table: same
# video frames AND same interleaved audio as vid_duet under a new
# name — the re-crawl case where both modality legs must agree.
import shutil
shutil.copyfile(os.path.join(D, 'vid_duet.avi'),
                os.path.join(D, 'vid_duet_c.avi'))
print('vid_duet_c: byte copy of vid_duet,',
      os.path.getsize(os.path.join(D, 'vid_duet_c.avi')), 'B')
