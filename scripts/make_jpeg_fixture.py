"""Write fixtures/tiny.jpg — a minimal structurally-valid 1x1 baseline
JFIF/JPEG built marker-by-marker from the public JPEG (ITU T.81) and JFIF
specs. No codec library involved; reproducible byte-for-byte.

Layout: SOI, APP0(JFIF 1.1), DQT(all-1 luma table), SOF0(8-bit 1x1, one
component), DHT(DC0: single length-2 code for category 0), DHT(AC0:
single length-2 code for EOB), SOS, one scan byte (DC category 0 + EOB,
padded with 1-bits), EOI. Decodes to a single mid-grey pixel under any
baseline decoder.

Usage: python scripts/make_jpeg_fixture.py
"""
import os
import struct

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, 'fixtures', 'tiny.jpg')


def marker(code, payload=b''):
    if payload:
        return struct.pack('>HH', code, len(payload) + 2) + payload
    return struct.pack('>H', code)


def main():
    soi = marker(0xFFD8)
    app0 = marker(0xFFE0, b'JFIF\x00' + bytes([1, 1, 0]) +
                  struct.pack('>HH', 1, 1) + bytes([0, 0]))
    dqt = marker(0xFFDB, bytes([0x00]) + bytes([1] * 64))
    sof0 = marker(0xFFC0, bytes([8]) + struct.pack('>HH', 1, 1) +
                  bytes([1, 1, 0x11, 0]))
    # Huffman: 16 code-length counts with ONE code of length 2, value 0
    counts = bytes([0, 1] + [0] * 14)
    dht_dc = marker(0xFFC4, bytes([0x00]) + counts + bytes([0]))
    dht_ac = marker(0xFFC4, bytes([0x10]) + counts + bytes([0]))
    sos = marker(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # scan: '00' (DC cat 0) + '00' (AC EOB), 1-padded -> 0b00001111
    scan = bytes([0x0F])
    eoi = marker(0xFFD9)
    data = soi + app0 + dqt + sof0 + dht_dc + dht_ac + sos + scan + eoi
    with open(OUT, 'wb') as fh:
        fh.write(data)
    print('wrote {} ({} bytes)'.format(OUT, len(data)))


if __name__ == '__main__':
    main()
