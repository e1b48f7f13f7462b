#!/usr/bin/env python3
"""Round-15 media fixture generator (kept for re-pinning):
 - talk_mp3.wav : RIFF/WAVE wrapping MPEG Layer 3 (fmt tag 0x0055) —
   structurally CONSISTENT (every mm18 structural check passes; the
   header is engineered so the PCM rate identities hold: bits=8,
   block_align=1, byte_rate=sample_rate) but codec-REJECTED: the
   visible-reject fixture (mm18 codec_reason = 'mp3_layer3'; the
   audio corpus and every family must exclude it, the streaming
   intake counter must count it).
 - vid_h264.avi : well-formed AVI whose vids strh declares
   fccHandler 'H264' with two 00dc (compressed) movi chunks — codec
   rejected video: mm18 codec_reason = 'h264'; no 00db raw frames,
   so payload_ok is honestly false (declared frames are not
   demuxable as raw) and every frame family excludes it.
Prints the header fields the enumerated-set specs assert."""
import struct, os

D = '/root/repo/src/main/resources/meta/media'


def chunk(cid, data):
    pad = b'\x00' if len(data) % 2 else b''
    return cid + struct.pack('<I', len(data)) + data + pad


def lst(form, payload):
    return chunk(b'LIST', form + payload)


def avih(uspf, frames, streams, w, h):
    a = struct.pack('<IIII', uspf, 0, 0, 0)
    a += struct.pack('<IIII', frames, 0, streams, 0)
    a += struct.pack('<II', w, h)
    a += struct.pack('<IIII', 0, 0, 0, 0)
    assert len(a) == 56
    return chunk(b'avih', a)


def strh(fcctype, handler):
    return chunk(b'strh', fcctype + handler + b'\x00' * 48)


# ---- talk_mp3.wav: MPEG-Layer-3 in WAV ------------------------------
# fake mp3 payload: one sync word then a deterministic byte pattern
pay = bytearray(b'\xff\xfb\x90\x44')
for i in range(396):
    pay.append((i * 73 + 29) % 256)
fmt = struct.pack('<HHIIHH', 0x0055, 1, 22050, 22050, 1, 8)
body = b'WAVE' + chunk(b'fmt ', fmt) + chunk(b'data', bytes(pay))
blob = b'RIFF' + struct.pack('<I', len(body)) + body
open(os.path.join(D, 'talk_mp3.wav'), 'wb').write(blob)
print('talk_mp3: file', len(blob), 'riff_bytes', len(blob) - 8,
      'fmt_tag 0x0055 ch 1 sr 22050 br 22050 ba 1 bits 8 data',
      len(pay), 'duration_ms', 1000 * len(pay) // 22050)

# ---- vid_h264.avi: H264 fccHandler, 00dc chunks ---------------------
frames = [bytes((j * 31 + 7) % 256 for j in range(37)),
          bytes((j * 17 + 3) % 256 for j in range(41))]
strls = lst(b'strl', strh(b'vids', b'H264') +
            chunk(b'strf', b'\x00' * 40))
hdrl = lst(b'hdrl', avih(41708, 2, 1, 8, 8) + strls)
movi = lst(b'movi', b''.join(chunk(b'00dc', f) for f in frames))
body = b'AVI ' + hdrl + movi
blob = b'RIFF' + struct.pack('<I', len(body)) + body
open(os.path.join(D, 'vid_h264.avi'), 'wb').write(blob)
print('vid_h264: file', len(blob), 'riff_bytes', len(blob) - 8,
      'uspf 41708 frames 2 w 8 h 8, 00dc sizes',
      [len(f) for f in frames])
