"""Generate the adversarial foreign-format fixtures committed in this dir.

These fixtures intentionally exercise real-corpus quirks the library's own
writers never produce: a format-1 SMF with notes interleaved across multiple
track chunks and channels plus a mid-file tempo change and cross-channel
sustain (the MAPS/MAESTRO shape, reference ``tools/io.py:426-529`` via mido);
an SMPTE-division SMF whose timing must ignore tempo events; and a
GuitarSet-corpus-shaped JAMS with the full annotation metadata, extra
namespaces to skip, float MIDI pitches, and unvoiced/zero pitch-contour
observations (reference ``tools/io.py:90-424``).

Run from this directory: ``python generate_fixtures.py``. The expected
parses are hand-derived in ``tests/test_adversarial_fixtures.py``.
"""

import json
import struct


def vlq(value):
    out = [value & 0x7F]
    value >>= 7
    while value:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    return bytes(reversed(out))


def track_chunk(events):
    body = b''
    for delta, msg in events:
        body += vlq(delta) + msg
    body += vlq(0) + b'\xff\x2f\x00'
    return b'MTrk' + struct.pack('>I', len(body)) + body


def write_format1_interleaved():
    """Format-1, 3 tracks, 2 channels, tempo change, sustain, running status.

    ticks_per_beat = 480. Tempo: 500000 us/beat until tick 960, then 250000.
    Seconds: t<=960 -> tick/960; t>960 -> 1.0 + (tick-960)/1920.

    Track 1 (channel 0): program change (skipped), C4 on @0 (t=0.0),
    E4 on @240 via running status (t=0.25), sustain on @300,
    C4 vel-0 off @480 via running status (t=0.5, sustained),
    E4 note-off @960 (t=1.0, sustained), sustain off @1100 (t=1.072916667),
    C3 on @1200 (t=1.125), C3 off @1440 (t=1.25).

    Track 2 (channel 1): G3 on @120 (t=0.125), pitch bend (skipped),
    G3 off @600 (t=0.625, sustained -> extends to 1.072916667).
    """

    track0 = track_chunk([
        (0, b'\xff\x51\x03' + struct.pack('>I', 500000)[1:]),
        (960, b'\xff\x51\x03' + struct.pack('>I', 250000)[1:]),
    ])

    track1 = track_chunk([
        (0, bytes([0xC0, 0x00])),             # program change (skip)
        (0, bytes([0x90, 60, 100])),          # C4 on, t=0.0
        (240, bytes([64, 90])),               # E4 on via running status, t=0.25
        (60, bytes([0xB0, 64, 100])),         # sustain ON @300
        (180, bytes([0x90, 60, 0])),          # C4 off (vel-0 note_on, running
                                              # status resumes after CC) @480
        (480, bytes([0x80, 64, 0])),          # E4 note-off @960
        (140, bytes([0xB0, 64, 0])),          # sustain OFF @1100
        (100, bytes([0x90, 48, 70])),         # C3 on @1200
        (240, bytes([0x80, 48, 0])),          # C3 off @1440
    ])

    track2 = track_chunk([
        (120, bytes([0x91, 55, 80])),         # G3 on (channel 1) @120
        (200, bytes([0xE1, 0x00, 0x50])),     # pitch bend (skip)
        (280, bytes([0x81, 55, 0])),          # G3 off @600 (sustained)
    ])

    header = b'MThd' + struct.pack('>IHHH', 6, 1, 3, 480)
    with open('format1_interleaved.mid', 'wb') as f:
        f.write(header + track0 + track1 + track2)


def write_smpte_25fps():
    """SMPTE division: 25 fps x 40 ticks/frame = 1000 ticks/sec.

    Contains a set_tempo meta event that MUST be ignored (SMPTE timing is
    absolute). Notes: A4 from tick 500 to 1500 (0.5 s - 1.5 s), C5 from
    tick 2000 to 2250 (2.0 s - 2.25 s).
    """

    division = ((256 - 25) << 8) | 40  # 0xE728

    track = track_chunk([
        (0, b'\xff\x51\x03' + struct.pack('>I', 250000)[1:]),  # ignored
        (500, bytes([0x90, 69, 100])),
        (1000, bytes([0x80, 69, 0])),
        (500, bytes([0x90, 72, 90])),
        (250, bytes([0x80, 72, 0])),
    ])

    header = b'MThd' + struct.pack('>IHHH', 6, 0, 1, division)
    with open('smpte_25fps.mid', 'wb') as f:
        f.write(header + track)


def _annotation_metadata(data_source):
    """The full metadata block real GuitarSet annotations carry."""

    return {
        'corpus': 'GuitarSet',
        'version': '1.0.0',
        'curator': {'name': 'Q. Xi', 'email': 'test@example.com'},
        'annotator': {},
        'annotation_tools': 'hexaphonic pickup + pYIN',
        'annotation_rules': '',
        'validation': '',
        'data_source': data_source,
    }


def write_guitarset_style_jams():
    """A GuitarSet-shaped JAMS: per-string note_midi + pitch_contour
    annotations with float MIDI pitches, unvoiced/zero contour observations,
    and beat_position / tempo / chord annotations that must be skipped.
    """

    def note(t, d, v):
        return {'time': t, 'duration': d, 'value': v, 'confidence': None}

    def contour(t, index, freq, voiced):
        return {'time': t, 'duration': 0.0,
                'value': {'index': index, 'frequency': freq, 'voiced': voiced},
                'confidence': None}

    annotations = [
        # Real files interleave contour and note annotations per string
        {
            'namespace': 'pitch_contour',
            'annotation_metadata': _annotation_metadata('0'),
            'data': [
                contour(0.00, 0, 82.41, False),    # unvoiced -> empty
                contour(0.01, 0, 190.0, True),
                contour(0.02, 0, 0.0, True),       # zero freq -> empty
                contour(0.03, 0, 195.0, True),
            ],
            'sandbox': {}, 'time': 0, 'duration': 3.0,
        },
        {
            'namespace': 'note_midi',
            'annotation_metadata': _annotation_metadata('0'),
            'data': [note(0.52, 0.51, 40.123), note(2.0, 0.5, 45.0)],
            'sandbox': {}, 'time': 0, 'duration': 3.0,
        },
        {
            'namespace': 'beat_position',
            'annotation_metadata': _annotation_metadata('solo'),
            'data': [{'time': 0.5, 'duration': 0.0,
                      'value': {'position': 1, 'measure': 1, 'num_beats': 4,
                                'beat_units': 4}, 'confidence': None}],
            'sandbox': {}, 'time': 0, 'duration': 3.0,
        },
        {
            'namespace': 'pitch_contour',
            'annotation_metadata': _annotation_metadata('1'),
            'data': [
                contour(0.11, 1, 112.0, True),
                contour(0.10, 1, 110.0, True),     # out of order on purpose
            ],
            'sandbox': {}, 'time': 0, 'duration': 3.0,
        },
        {
            'namespace': 'note_midi',
            'annotation_metadata': _annotation_metadata('1'),
            'data': [note(0.1, 0.25, 45.21)],
            'sandbox': {}, 'time': 0, 'duration': 3.0,
        },
        {
            'namespace': 'tempo',
            'annotation_metadata': _annotation_metadata('solo'),
            'data': [{'time': 0.0, 'duration': 3.0, 'value': 120.0,
                      'confidence': 1.0}],
            'sandbox': {}, 'time': 0, 'duration': 3.0,
        },
        {
            'namespace': 'chord',
            'annotation_metadata': _annotation_metadata('instructed'),
            'data': [{'time': 0.0, 'duration': 3.0, 'value': 'G:maj',
                      'confidence': None}],
            'sandbox': {}, 'time': 0, 'duration': 3.0,
        },
    ]

    jam = {
        'annotations': annotations,
        'file_metadata': {
            'title': '00_BN1-129-Eb_solo',
            'artist': 'player_00',
            'release': '',
            'duration': 3.0,
            'identifiers': {},
            'jams_version': '0.3.4',
        },
        'sandbox': {},
    }

    with open('guitarset_style.jams', 'w') as f:
        json.dump(jam, f, indent=2)


if __name__ == '__main__':
    write_format1_interleaved()
    write_smpte_25fps()
    write_guitarset_style_jams()
    print('fixtures written')
