"""Generate the TTML conformance corpus.

The reference validates fluttml manually against the public W3C TTML1
testsuite and the IRT EBU-TT-D application samples, organized in six
feature areas (reference: plugins/ttml/README.md:12-45 — Animation,
Content, Metadata, Parameters, Styling, Timing). Those suites cannot be
vendored here (no network egress), so this corpus is a FAITHFUL
SYNTHESIS: every document is written from the TTML1 spec feature the
same-named W3C test exercises, in the W3C suite's area/numbered-name
layout, plus an EbuTtD area for the IRT sample patterns (cell-resolution
styling, linePadding-style padding, 100% extents). No document text is
copied from either suite.

Run from the repo root:  python tests/ttml_corpus/_make_corpus.py
Regenerates every .xml fixture deterministically (idempotent).
"""

import os

HERE = os.path.dirname(os.path.abspath(__file__))

TT = ('<tt xmlns="http://www.w3.org/ns/ttml" '
      'xmlns:tts="http://www.w3.org/ns/ttml#styling" '
      'xmlns:ttp="http://www.w3.org/ns/ttml#parameter" '
      'xmlns:ttm="http://www.w3.org/ns/ttml#metadata"')

XML = '<?xml version="1.0" encoding="utf-8"?>\n'


def doc(attrs: str = "", head: str = "", body: str = "") -> str:
    a = (" " + attrs) if attrs else ""
    h = f"  <head>\n{head}  </head>\n" if head else ""
    return f"{XML}{TT}{a}>\n{h}  <body>\n{body}  </body>\n</tt>\n"


def region(rid: str, extra: str = "", origin: str = "10% 70%",
           extent: str = "80% 20%") -> str:
    return (f'      <region xml:id="{rid}" tts:origin="{origin}" '
            f'tts:extent="{extent}"{(" " + extra) if extra else ""}/>\n')


def layout(*regions: str) -> str:
    return "    <layout>\n" + "".join(regions) + "    </layout>\n"


def styling(*styles: str) -> str:
    return "    <styling>\n" + "".join(styles) + "    </styling>\n"


def p(text: str, begin="0s", end="2s", extra: str = "") -> str:
    return (f'    <div>\n      <p begin="{begin}" end="{end}"'
            f'{(" " + extra) if extra else ""}>{text}</p>\n    </div>\n')


DOCS = {}

# ---------------------------------------------------------------- Animation
DOCS["Animation"] = {
    # a SET changing color mid-cue -> three intervals
    "Animation001": doc(body=p(
        'Fade\n      <set begin="0.5s" end="1s" tts:color="red"/>',
        extra='tts:color="white"')),
    # SET with dur instead of end
    "Animation002": doc(body=p(
        'Pulse\n      <set begin="1s" dur="0.5s" tts:color="lime"/>',
        extra='tts:color="yellow"')),
    # two sequential SETs on the same attribute
    "Animation003": doc(body=p(
        'Steps'
        '\n      <set begin="0.5s" end="1s" tts:color="red"/>'
        '\n      <set begin="1s" end="1.5s" tts:color="blue"/>',
        extra='tts:color="white"')),
    # SET on backgroundColor
    "Animation004": doc(body=p(
        'BgFlash\n      <set begin="1s" end="2s" '
        'tts:backgroundColor="maroon"/>',
        end="3s", extra='tts:backgroundColor="navy"')),
    # SET toggling visibility (blink)
    "Animation005": doc(body=p(
        'Blink\n      <set begin="0.5s" end="1s" tts:visibility="hidden"/>',
        extra='tts:visibility="visible"')),
    # SET on fontSize
    "Animation006": doc(body=p(
        'Grow\n      <set begin="1s" end="2s" tts:fontSize="32px"/>',
        end="3s", extra='tts:fontSize="16px"')),
    # SET inside a span
    "Animation007": doc(body=p(
        '<span tts:color="silver">inner'
        '<set begin="1s" end="1.5s" tts:color="fuchsia"/></span>')),
    # SET with times relative to a non-zero cue begin
    "Animation008": doc(body=p(
        'Late\n      <set begin="0.5s" end="1s" tts:color="aqua"/>',
        begin="2s", end="4s", extra='tts:color="white"')),
    # SET animating a region attribute (backgroundColor on the region)
    "Animation009": doc(
        head=layout(region("r1", extra='tts:backgroundColor="black"')
                    .replace("/>", '>\n        <set begin="1s" end="2s" '
                                   'tts:backgroundColor="white"/>\n'
                             '      </region>\n')),
        body=p('region anim', end="3s", extra='region="r1"')),
    # two SETs on DIFFERENT attributes overlapping in time
    "Animation010": doc(body=p(
        'Multi'
        '\n      <set begin="0.5s" end="1.5s" tts:color="red"/>'
        '\n      <set begin="1s" end="2s" tts:backgroundColor="navy"/>',
        extra='tts:color="white"')),
    # ---- round-5 rebalance (verdict r4 #6): SET coverage across every
    # animatable styling attribute, overlapping SETs on ONE attribute,
    # container-relative animation times, and animated regions that
    # survive ttmlsegmentedparse re-serialization (the area where the
    # round-3 duplicate-XML-attribute bug hid).
    # SET on fontWeight
    "Animation011": doc(body=p(
        'Bolden\n      <set begin="1s" end="2s" tts:fontWeight="bold"/>',
        end="3s", extra='tts:fontWeight="normal"')),
    # SET on fontStyle
    "Animation012": doc(body=p(
        'Slant\n      <set begin="0.5s" end="1.5s" '
        'tts:fontStyle="italic"/>',
        extra='tts:fontStyle="normal"')),
    # SET on textDecoration
    "Animation013": doc(body=p(
        'Underline\n      <set begin="1s" end="2s" '
        'tts:textDecoration="underline"/>',
        end="3s", extra='tts:textDecoration="none"')),
    # SET on textOutline
    "Animation014": doc(body=p(
        'Outline\n      <set begin="0.5s" end="1.5s" '
        'tts:textOutline="red 2px"/>',
        extra='tts:color="white"')),
    # SET on opacity (region-level fade pattern)
    "Animation015": doc(
        head=layout(region("r1", extra='tts:opacity="1"')
                    .replace("/>", '>\n        <set begin="1s" end="2s" '
                                   'tts:opacity="0.3"/>\n'
                             '      </region>\n')),
        body=p('fading region', end="3s", extra='region="r1"')),
    # SET on textAlign
    "Animation016": doc(body=p(
        'Shift\n      <set begin="1s" end="2s" tts:textAlign="end"/>',
        end="3s", extra='tts:textAlign="start"')),
    # SET on display (content disappears entirely)
    "Animation017": doc(body=p(
        'Vanish\n      <set begin="1s" end="1.5s" tts:display="none"/>',
        extra='tts:display="auto"')),
    # SET on lineHeight on multi-row content
    "Animation018": doc(body=p(
        'rows<br/>grow'
        '\n      <set begin="1s" end="2s" tts:lineHeight="200%"/>',
        end="3s", extra='tts:lineHeight="100%"')),
    # SET animating region origin (moving region)
    "Animation019": doc(
        head=layout(region("r1")
                    .replace("/>", '>\n        <set begin="1s" end="2s" '
                                   'tts:origin="10% 10%"/>\n'
                             '      </region>\n')),
        body=p('mover', end="3s", extra='region="r1"')),
    # SET animating region extent (resizing region)
    "Animation020": doc(
        head=layout(region("r1")
                    .replace("/>", '>\n        <set begin="1s" end="2s" '
                                   'tts:extent="40% 20%"/>\n'
                             '      </region>\n')),
        body=p('resizer', end="3s", extra='region="r1"')),
    # OVERLAPPING SETs on the SAME attribute: the second begins before
    # the first ends — per-attribute event merge order decides the
    # mid-window winner (gstttmlattribute.c:1260-1272 analog)
    "Animation021": doc(body=p(
        'Overlap'
        '\n      <set begin="0.5s" end="1.5s" tts:color="red"/>'
        '\n      <set begin="1s" end="2s" tts:color="blue"/>',
        end="3s", extra='tts:color="white"')),
    # overlapping SETs, second fully INSIDE the first's window
    "Animation022": doc(body=p(
        'Nested'
        '\n      <set begin="0.5s" end="2.5s" tts:color="red"/>'
        '\n      <set begin="1s" end="1.5s" tts:color="lime"/>',
        end="3s", extra='tts:color="white"')),
    # three-deep overlap on one attribute
    "Animation023": doc(body=p(
        'Triple'
        '\n      <set begin="0.5s" end="3s" tts:color="red"/>'
        '\n      <set begin="1s" end="2.5s" tts:color="lime"/>'
        '\n      <set begin="1.5s" end="2s" tts:color="blue"/>',
        end="4s", extra='tts:color="white"')),
    # container-relative times: cue inside a div with begin offset —
    # the SET's 0.5s is relative to the cue, the cue to the div
    "Animation024": doc(body=(
        '    <div begin="1s" end="5s">\n'
        '      <p begin="1s" end="3s" tts:color="white">Offset'
        '\n      <set begin="0.5s" end="1s" tts:color="aqua"/></p>\n'
        '    </div>\n')),
    # SET with begin only — runs to the cue's end
    "Animation025": doc(body=p(
        'OpenEnd\n      <set begin="1s" tts:color="red"/>',
        end="3s", extra='tts:color="white"')),
    # SET with neither begin nor end — active for the whole cue
    "Animation026": doc(body=p(
        'Whole\n      <set tts:color="fuchsia"/>',
        extra='tts:color="white"')),
    # zero-duration SET (begin == end) — must not emit an interval
    "Animation027": doc(body=p(
        'Zero\n      <set begin="1s" end="1s" tts:color="red"/>',
        extra='tts:color="white"')),
    # SET clipped by the cue's end (animation window exceeds the cue)
    "Animation028": doc(body=p(
        'Clipped\n      <set begin="1.5s" end="10s" tts:color="red"/>',
        extra='tts:color="white"')),
    # SETs on two nested spans animating independently
    "Animation029": doc(body=p(
        '<span tts:color="silver">outer'
        '<set begin="0.5s" end="1s" tts:color="red"/>'
        '<span tts:color="gray">inner'
        '<set begin="1s" end="1.5s" tts:color="lime"/>'
        '</span></span>')),
    # animated region + animated span TOGETHER (re-serialization
    # through segmentedparse exercises both markup paths at once)
    "Animation030": doc(
        head=layout(region("r1", extra='tts:backgroundColor="black"')
                    .replace("/>", '>\n        <set begin="1s" end="2s" '
                                   'tts:backgroundColor="gray"/>\n'
                             '      </region>\n')),
        body=p('combo'
               '\n      <set begin="0.5s" end="1.5s" tts:color="red"/>',
               end="3s", extra='region="r1" tts:color="white"')),
}

# ------------------------------------------------------------------ Content
DOCS["Content"] = {
    "Br001": doc(body=p('line one<br/>line two')),
    "Br002": doc(body=p('a<br/><br/>b')),
    "Span001": doc(body=p('plain <span tts:color="red">red</span> plain')),
    "Span002": doc(body=p(
        '<span tts:color="red">r <span tts:fontWeight="bold">rb</span>'
        ' r</span>')),
    "Span003": doc(body=p(
        '<span tts:color="red">one</span> and '
        '<span tts:color="blue">two</span>')),
    # span with its own timing splits the paragraph interval
    "Span004": doc(body=p(
        'base <span begin="1s" end="2s" tts:color="green">timed</span>',
        end="3s")),
    "Div001": doc(
        head=layout(region("r1", origin="0% 0%", extent="100% 40%"),
                    region("r2", origin="0% 60%", extent="100% 40%")),
        body=('    <div region="r1"><p begin="0s" end="2s">top</p></div>\n'
              '    <div region="r2"><p begin="0s" end="2s">bottom</p>'
              '</div>\n')),
    "Paragraph001": doc(body=(
        '    <div>\n'
        '      <p begin="0s" end="1s">first</p>\n'
        '      <p begin="1s" end="2s">second</p>\n'
        '      <p begin="2s" end="3s">third</p>\n'
        '    </div>\n')),
    # overlapping paragraphs in one div
    "Paragraph002": doc(body=(
        '    <div>\n'
        '      <p begin="0s" end="2s">long</p>\n'
        '      <p begin="1s" end="3s">overlap</p>\n'
        '    </div>\n')),
    "MixedContent001": doc(body=p(
        'head <span tts:fontStyle="italic">mid</span> tail')),
    # xml:space toggling on nested elements
    "Whitespace001": doc(body=p(
        'collapse   me <span xml:space="preserve">keep   these</span>'
        ' outer   again')),
    # br inside a nested styled span
    "Br003": doc(body=p(
        '<span tts:fontWeight="bold">bold line<br/>still bold</span>')),
    # br at paragraph start and end (leading/trailing blank lines)
    "Br004": doc(body=p('<br/>middle<br/>')),
    # nested divs: the inner paragraph flows into the OUTER div's region
    "Div002": doc(
        head=layout(region("r1", origin="0% 0%", extent="100% 40%",
                           extra='tts:backgroundColor="gray"')),
        body=('    <div region="r1">\n'
              '      <div><p begin="0s" end="2s">inherited region</p>'
              '</div>\n'
              '    </div>\n')),
    # div timing clips its children
    "Div003": doc(body=(
        '    <div begin="1s" end="3s">\n'
        '      <p begin="0s" end="10s">clipped by div</p>\n'
        '    </div>\n')),
    # three-level nested spans, each contributing a style
    "Span005": doc(body=p(
        '<span tts:color="red">a<span tts:fontWeight="bold">b'
        '<span tts:fontStyle="italic">c</span>b</span>a</span>')),
    # two independently TIMED spans inside one paragraph
    "Span006": doc(body=p(
        '<span begin="0s" end="1s" tts:color="red">first</span>'
        '<span begin="1s" end="2s" tts:color="blue">second</span>',
        end="3s")),
    # paragraph whose only child is a span (no anonymous text)
    "Paragraph003": doc(body=p('<span>wrapped only</span>')),
    # empty paragraph between cues must not break the timeline
    "Paragraph004": doc(body=(
        '    <div>\n'
        '      <p begin="0s" end="1s">before</p>\n'
        '      <p begin="1s" end="2s"></p>\n'
        '      <p begin="2s" end="3s">after</p>\n'
        '    </div>\n')),
    # xml:space=preserve directly on the paragraph
    "Whitespace002": doc(body=p(
        'lead    mid    tail', extra='xml:space="preserve"')),
    # xml:lang on nested content is carried without affecting layout
    "Language001": doc(
        attrs='xml:lang="en"',
        body=p('english <span xml:lang="de">deutsch</span>')),
}

# ----------------------------------------------------------------- Metadata
DOCS["Metadata"] = {
    # title/desc/copyright in head metadata must not affect output
    "Desc001": doc(
        head=('    <metadata>\n'
              '      <ttm:title>corpus title</ttm:title>\n'
              '      <ttm:desc>a descriptive string</ttm:desc>\n'
              '      <ttm:copyright>2026 flutpu</ttm:copyright>\n'
              '    </metadata>\n'),
        body=p('content')),
    # agent declarations referenced from content
    "Agent001": doc(
        head=('    <metadata>\n'
              '      <ttm:agent type="person" xml:id="speaker1">\n'
              '        <ttm:name type="full">Narrator</ttm:name>\n'
              '      </ttm:agent>\n'
              '    </metadata>\n'),
        body=p('spoken line', extra='ttm:agent="speaker1"')),
    # metadata nested inside body content is ignored for rendering
    "Metadata001": doc(body=p(
        '<metadata><ttm:desc>inline meta</ttm:desc></metadata>visible')),
    # ttm:role on a paragraph
    "Role001": doc(body=p('captioned', extra='ttm:role="caption"')),
    # foreign-namespace attributes must be skipped without error
    "Foreign001": doc(
        attrs='xmlns:x="urn:example:foreign" x:custom="1"',
        body=p('tolerant', extra='x:other="y"')),
    # foreign-namespace ELEMENTS inside content are skipped, text kept
    "Foreign002": doc(
        attrs='xmlns:x="urn:example:foreign"',
        body=p('keep <x:widget>drop-attr-level</x:widget> this')),
    # SMPTE embedded image metadata (base64 PNG in head, referenced)
    "SmpteImage001": doc(
        attrs='xmlns:smpte="http://www.smpte-ra.org/schemas/2052-1/2010/'
              'smpte-tt"',
        head=('    <metadata>\n'
              '      <smpte:image xml:id="i1" imagetype="PNG" '
              'encoding="Base64">iVBORw0KGgoAAAANSUhEUgAAAAgAAAAICAYAAADED7'
              '6LAAAAFklEQVR4nGP8z8Dwn4EIwESMolGFlCsEAE1NAh9VXm1eAAAAAElFTkSu'
              'QmCC</smpte:image>\n'
              '    </metadata>\n' + layout(
                  region("r1", extra='smpte:backgroundImage="#i1"'))),
        body=p('image region', extra='region="r1"')),
    # character agent with an actor reference (ttml1 §12.1.6 pattern)
    "Agent002": doc(
        head=('    <metadata>\n'
              '      <ttm:agent type="person" xml:id="per1">\n'
              '        <ttm:name type="full">A. Person</ttm:name>\n'
              '      </ttm:agent>\n'
              '      <ttm:agent type="character" xml:id="char1">\n'
              '        <ttm:name type="alias">HERO</ttm:name>\n'
              '        <ttm:actor agent="per1"/>\n'
              '      </ttm:agent>\n'
              '    </metadata>\n'),
        body=p('in character', extra='ttm:agent="char1"')),
    # title-only metadata
    "Title001": doc(
        head='    <metadata><ttm:title>only a title</ttm:title>'
             '</metadata>\n',
        body=p('titled')),
    # ttm:role on a span inside the paragraph
    "Role002": doc(body=p(
        'narration <span ttm:role="music">♪ theme ♪</span>')),
    # metadata element inside a region definition is skipped
    "Metadata002": doc(
        head=layout(region("r1").replace(
            "/>", '>\n        <metadata><ttm:desc>region meta</ttm:desc>'
                  '</metadata>\n      </region>\n')),
        body=p('region with meta', extra='region="r1"')),
    # foreign-namespace element in the HEAD is skipped entirely
    "Foreign003": doc(
        attrs='xmlns:x="urn:example:foreign"',
        head='    <x:extension><x:inner attr="1">text</x:inner>'
             '</x:extension>\n',
        body=p('head survived')),
}

# --------------------------------------------------------------- Parameters
DOCS["Parameters"] = {
    "CellResolution001": doc(
        attrs='ttp:cellResolution="20 10"',
        head=layout(region("r1", origin="1c 7c", extent="10c 2c")),
        body=p('cells', extra='region="r1"')),
    "CellResolution002": doc(
        attrs='ttp:cellResolution="40 24"',
        body=p('<span tts:fontSize="2c">two cells tall</span>')),
    "FrameRate001": doc(
        attrs='ttp:frameRate="25"',
        body=p('frames', begin="00:00:00:05", end="00:00:01:15")),
    "FrameRateMultiplier001": doc(
        attrs='ttp:frameRate="30" ttp:frameRateMultiplier="1000 1001"',
        body=p('ntsc', begin="00:00:00:15", end="00:00:02:00")),
    "PixelAspectRatio001": doc(
        attrs='ttp:pixelAspectRatio="16 11" tts:extent="704px 576px"',
        body=p('anamorphic')),
    "TickRate001": doc(
        attrs='ttp:tickRate="10"',
        body=p('ticks', begin="5t", end="20t")),
    "SubFrameRate001": doc(
        attrs='ttp:frameRate="25" ttp:subFrameRate="2"',
        body=p('subframes', begin="00:00:00:10.1", end="00:00:01:00")),
    "TimeBase001": doc(
        attrs='ttp:timeBase="media"',
        body=p('media time', begin="00:00:01", end="00:00:02")),
    # markerMode/dropMode are parsed and tolerated without rendering
    # effect (the reference never consumes them either)
    "MarkerMode001": doc(
        attrs='ttp:frameRate="30" ttp:markerMode="continuous"',
        body=p('markers', begin="00:00:00:10", end="00:00:01:00")),
    "DropMode001": doc(
        attrs='ttp:frameRate="30" ttp:frameRateMultiplier="1000 1001" '
              'ttp:dropMode="dropNTSC"',
        body=p('drop frames', begin="00:00:00:15", end="00:00:02:00")),
    # ttp:profile on tt is informative only — content must still play
    "Profile001": doc(
        attrs='ttp:profile="http://www.w3.org/ns/ttml/profile/dfxp-'
              'presentation"',
        body=p('profiled')),
    # frame metric at a frame-count above one second's worth of frames
    "FrameRate002": doc(
        attrs='ttp:frameRate="30"',
        body=p('high frames', begin="45f", end="90f")),
    # frames roll into seconds at exactly frameRate
    "FrameRate003": doc(
        attrs='ttp:frameRate="25"',
        body=p('rollover', begin="00:00:01:24", end="00:00:02:00")),
    # region origin/extent/padding all in cell units under an explicit
    # cell grid
    "CellResolution003": doc(
        attrs='ttp:cellResolution="20 10"',
        head=layout(region("r1", origin="2c 7c", extent="16c 2c",
                           extra='tts:padding="0.25c 0.5c" '
                                 'tts:backgroundColor="black"')),
        body=p('cell padding', extra='region="r1"')),
    # large tick rate exercises sub-millisecond offsets
    "TickRate002": doc(
        attrs='ttp:tickRate="90000"',
        body=p('mpeg ticks', begin="45000t", end="180000t")),
}

# ------------------------------------------------------------------ Styling
DOCS["Styling"] = {
    "Color001": doc(body=p('<span tts:color="red">named</span>')),
    "Color002": doc(body=p('<span tts:color="#00ff00">hex6</span>')),
    "Color003": doc(body=p('<span tts:color="#0000ff80">hex8</span>')),
    "Color004": doc(body=p('<span tts:color="rgb(255,128,0)">rgb</span>')),
    "Color005": doc(body=p(
        '<span tts:color="rgba(255,0,255,128)">rgba</span>')),
    "BackgroundColor001": doc(
        head=layout(region("r1", extra='tts:backgroundColor="navy"')),
        body=p('on region', extra='region="r1"')),
    "BackgroundColor002": doc(body=p(
        '<span tts:backgroundColor="teal">boxed</span>')),
    "Direction001": doc(body=p(
        '<span tts:direction="rtl">abc</span>')),
    "DisplayAlign001": doc(
        head=layout(region("r1", extra='tts:displayAlign="after" '
                                       'tts:backgroundColor="gray"',
                           origin="10% 10%", extent="80% 80%")),
        body=p('bottom aligned', extra='region="r1"')),
    "Display001": doc(body=(
        '    <div>\n'
        '      <p begin="0s" end="2s" tts:display="none">hidden</p>\n'
        '      <p begin="0s" end="2s">shown</p>\n'
        '    </div>\n')),
    "FontFamily001": doc(body=p(
        '<span tts:fontFamily="monospaceSansSerif">mono</span>')),
    "FontSize001": doc(body=p('<span tts:fontSize="24px">px24</span>')),
    "FontSize002": doc(body=p(
        '<span tts:fontSize="150%">bigger</span>')),
    "FontSize003": doc(body=p(
        '<span tts:fontSize="2em">two em</span>')),
    "FontStyle001": doc(body=p(
        '<span tts:fontStyle="italic">slanted</span>')),
    "FontWeight001": doc(body=p(
        '<span tts:fontWeight="bold">heavy</span>')),
    "LineHeight001": doc(body=p(
        '<span tts:lineHeight="200%">first</span><br/>second')),
    "Opacity001": doc(
        head=layout(region("r1", extra='tts:opacity="0.5" '
                                       'tts:backgroundColor="red"')),
        body=p('half', extra='region="r1"')),
    "Origin001": doc(
        head=layout(region("r1", origin="25% 25%", extent="50% 50%",
                           extra='tts:backgroundColor="green"')),
        body=p('centered box', extra='region="r1"')),
    "Origin002": doc(
        head=layout(region("r1", origin="40px 30px", extent="200px 60px",
                           extra='tts:backgroundColor="purple"')),
        body=p('pixel box', extra='region="r1"')),
    "Overflow001": doc(
        head=layout(region("r1", origin="10% 10%", extent="20% 10%",
                           extra='tts:overflow="hidden" '
                                 'tts:backgroundColor="black"')),
        body=p('a very long line that cannot possibly fit the tiny region',
               extra='region="r1"')),
    "Padding001": doc(
        head=layout(region("r1", extra='tts:padding="5px 10px" '
                                       'tts:backgroundColor="olive"')),
        body=p('padded', extra='region="r1"')),
    "Padding002": doc(
        head=layout(region("r1", extra='tts:padding="2px 4px 6px 8px" '
                                       'tts:backgroundColor="olive"')),
        body=p('asym pad', extra='region="r1"')),
    "ShowBackground001": doc(
        head=layout(region("r1", extra='tts:showBackground="always" '
                                       'tts:backgroundColor="maroon"')),
        body=p('late cue', begin="1s", end="2s", extra='region="r1"')),
    "TextAlign001": doc(body=p('centered', extra='tts:textAlign="center"')),
    "TextAlign002": doc(body=p('right side', extra='tts:textAlign="right"')),
    "TextAlign003": doc(body=p('at end', extra='tts:textAlign="end"')),
    "TextDecoration001": doc(body=p(
        '<span tts:textDecoration="underline">under</span>')),
    "TextDecoration002": doc(body=p(
        '<span tts:textDecoration="lineThrough">struck</span>')),
    "TextDecoration003": doc(body=p(
        '<span tts:textDecoration="overline">over</span>')),
    "TextOutline001": doc(body=p(
        '<span tts:textOutline="black 2px">outlined</span>')),
    "UnicodeBidi001": doc(body=p(
        '<span tts:unicodeBidi="bidiOverride" tts:direction="rtl">'
        'forced</span>')),
    "Visibility001": doc(body=(
        '    <div>\n'
        '      <p begin="0s" end="2s" tts:visibility="hidden">ghost</p>\n'
        '      <p begin="0s" end="2s">solid</p>\n'
        '    </div>\n')),
    "WrapOption001": doc(
        head=layout(region("r1", origin="10% 10%", extent="30% 30%")),
        body=p('nowrap text that would otherwise fold into several lines',
               extra='region="r1" tts:wrapOption="noWrap"')),
    "WritingMode001": doc(
        head=layout(region("r1", origin="70% 10%", extent="20% 80%",
                           extra='tts:writingMode="tbrl" '
                                 'tts:backgroundColor="navy"')),
        body=p('vertical', extra='region="r1"')),
    "ZIndex001": doc(
        head=layout(
            region("r1", origin="10% 10%", extent="50% 50%",
                   extra='tts:zIndex="2" tts:backgroundColor="red"'),
            region("r2", origin="30% 30%", extent="50% 50%",
                   extra='tts:zIndex="1" tts:backgroundColor="blue"')),
        body=('    <div region="r1"><p begin="0s" end="2s">front</p></div>\n'
              '    <div region="r2"><p begin="0s" end="2s">back</p>'
              '</div>\n')),
    # referential styling: style element referenced by id
    "StyleReference001": doc(
        head=styling('      <style xml:id="s1" tts:color="yellow" '
                     'tts:fontWeight="bold"/>\n'),
        body=p('styled by reference', extra='style="s1"')),
    # style chaining: a style that references another style
    "StyleReference002": doc(
        head=styling(
            '      <style xml:id="base" tts:color="lime"/>\n'
            '      <style xml:id="derived" style="base" '
            'tts:fontStyle="italic"/>\n'),
        body=p('chained', extra='style="derived"')),
    # region style applies to content flowed into it
    "RegionStyle001": doc(
        head=(styling('      <style xml:id="rs" tts:color="aqua"/>\n') +
              layout(region("r1", extra='style="rs"'))),
        body=p('region styled', extra='region="r1"')),
    # anamorphic two-length fontSize (independent x/y scale — the
    # reference's per-glyph shape-attr path, gstttmlrender.c:745-857)
    "FontSize004": doc(body=p(
        '<span tts:fontSize="32px 16px">squeezed</span>')),
    "FontSize005": doc(body=p(
        '<span tts:fontSize="12px 24px">stretched</span>')),
    # textOutline with a blur radius (color width blur)
    "TextOutline002": doc(body=p(
        '<span tts:textOutline="red 2px 2px">soft edge</span>')),
    # textOutline without an explicit color (inherits text color)
    "TextOutline003": doc(body=p(
        '<span tts:color="yellow" tts:textOutline="3px">self color'
        '</span>')),
    # lineHeight normal keyword resets an inherited percentage
    "LineHeight002": doc(body=p(
        '<span tts:lineHeight="normal">n1</span><br/>n2',
        extra='tts:lineHeight="180%"')),
    # transparent backgroundColor keyword
    "Color006": doc(
        head=layout(region("r1",
                           extra='tts:backgroundColor="transparent"')),
        body=p('see-through box', extra='region="r1"')),
    # quoted font family list with fallback generic
    "FontFamily002": doc(body=p(
        "<span tts:fontFamily=\"'DejaVu Sans', monospace\">listed"
        "</span>")),
    # vertical left-to-right writing mode (tblr)
    "WritingMode002": doc(
        head=layout(region("r1", origin="10% 10%", extent="20% 80%",
                           extra='tts:writingMode="tblr" '
                                 'tts:backgroundColor="navy"')),
        body=p('vertical lr', extra='region="r1"')),
    # region extent overflowing the window must clamp, not wrap/crash
    "Extent001": doc(
        head=layout(region("r1", origin="50% 50%", extent="100% 100%",
                           extra='tts:backgroundColor="green"')),
        body=p('clamped box', extra='region="r1"')),
    # padding shorthand with three values (top sides bottom)
    "Padding004": doc(
        head=layout(region("r1", extra='tts:padding="2px 8px 4px" '
                                       'tts:backgroundColor="olive"')),
        body=p('three-value pad', extra='region="r1"')),
}

# ------------------------------------------------------------------- Timing
DOCS["Timing"] = {
    # seq container nested inside a timed div
    "Sequence002": doc(body=(
        '    <div begin="1s" end="10s" timeContainer="seq">\n'
        '      <p dur="1s">one</p>\n'
        '      <p dur="2s">two</p>\n'
        '    </div>\n')),
    # par children with begin offsets
    "Parallel002": doc(body=(
        '    <div timeContainer="par" begin="1s" end="4s">\n'
        '      <p begin="0s" end="1s">early</p>\n'
        '      <p begin="1s" end="2s">late</p>\n'
        '    </div>\n')),
    # zero-duration cue: must not emit a negative/invalid interval
    "ZeroDur001": doc(body=(
        '    <div>\n'
        '      <p begin="1s" end="1s">instant</p>\n'
        '      <p begin="1s" end="2s">after</p>\n'
        '    </div>\n')),
    # span with only a begin (runs to the paragraph end)
    "SpanBeginOnly001": doc(body=p(
        'base <span begin="1s" tts:color="red">tail</span>', end="3s")),
    "BeginEnd001": doc(body=p('plain seconds', begin="1s", end="3s")),
    "BeginEnd002": doc(body=p('clock time', begin="00:00:01",
                              end="00:00:02.5")),
    "BeginEnd003": doc(body=(
        '    <div begin="1s" end="5s">\n'
        '      <p begin="0.5s" end="2s">container relative</p>\n'
        '    </div>\n')),
    "Dur001": doc(body=p('duration only', begin="1s", end="", extra="")
                  .replace(' end=""', ' dur="2s"')),
    "Dur002": doc(body=(
        '    <div>\n'
        '      <p begin="0s" dur="3s" end="2s">min of dur and end</p>\n'
        '    </div>\n')),
    "OffsetMetrics001": doc(body=p('milliseconds', begin="500ms",
                                   end="1500ms")),
    "OffsetMetrics002": doc(body=p('minutes', begin="0.01m", end="0.03m")),
    "OffsetMetrics003": doc(
        attrs='ttp:frameRate="25"',
        body=p('frame metric', begin="10f", end="50f")),
    "Fraction001": doc(body=p('fractional', begin="0.25s", end="1.75s")),
    "Sequence001": doc(body=(
        '    <div timeContainer="seq">\n'
        '      <p dur="1s">first</p>\n'
        '      <p dur="1s">second</p>\n'
        '      <p dur="1s">third</p>\n'
        '    </div>\n')),
    "Parallel001": doc(body=(
        '    <div timeContainer="par">\n'
        '      <p begin="0s" end="1s">one</p>\n'
        '      <p begin="0s" end="1s">two</p>\n'
        '    </div>\n')),
    "BodyTiming001": doc(body=(
        '    <div>\n'
        '      <p begin="0s" end="100s">clipped by body</p>\n'
        '    </div>\n').replace("<body>", "")
        ).replace("<body>", '<body begin="0s" dur="2s">'),
    # seq container directly on the body element: div children run
    # back to back
    "Sequence003": doc(body=(
        '    <div dur="1s"><p>body seq one</p></div>\n'
        '    <div dur="1s"><p>body seq two</p></div>\n')).replace(
            "<body>", '<body timeContainer="seq">'),
    # seq nested inside seq: the inner container carries an explicit dur
    # (a dur-LESS seq child is ignored — see Sequence006) and the outer
    # cursor advances past it
    "Sequence004": doc(body=(
        '    <div timeContainer="seq">\n'
        '      <div timeContainer="seq" dur="2s">\n'
        '        <p dur="1s">inner a</p>\n'
        '        <p dur="1s">inner b</p>\n'
        '      </div>\n'
        '      <p dur="1s">outer next</p>\n'
        '    </div>\n')),
    # reference contract (gstttmlbase.c:595-600): a child of a seq
    # container that does not declare dur gets DUR=0 — "this node must
    # be ignored" — and the cursor does not advance past it
    "Sequence006": doc(body=(
        '    <div timeContainer="seq">\n'
        '      <p dur="1s">kept one</p>\n'
        '      <p>ignored (no dur in seq)</p>\n'
        '      <p dur="1s">kept two</p>\n'
        '    </div>\n')),
    # par div inside a seq container
    "Sequence005": doc(body=(
        '    <div timeContainer="seq">\n'
        '      <p dur="1s">lead</p>\n'
        '      <div timeContainer="par" dur="2s">\n'
        '        <p begin="0s" end="2s">par one</p>\n'
        '        <p begin="1s" end="2s">par two</p>\n'
        '      </div>\n'
        '    </div>\n')),
    # begin with no end inside a BOUNDED container: runs to container end
    "BeginOnly001": doc(body=(
        '    <div begin="0s" end="3s">\n'
        '      <p begin="1s">until container end</p>\n'
        '    </div>\n')),
    # hh:mm:ss with fraction at an hour boundary
    "ClockTime001": doc(body=p('hour mark', begin="00:59:59.5",
                               end="01:00:00.5")),
    # subframe rollover: .1 of 2 subframes at 25fps is half a frame
    "SubFrameRate002": doc(
        attrs='ttp:frameRate="25" ttp:subFrameRate="2"',
        body=p('subframe rollover', begin="00:00:00:24.1",
               end="00:00:01:10.0")),
}

# ------------------------------------------------------------------ EbuTtD
EBU_TT = ('<tt xmlns="http://www.w3.org/ns/ttml" '
          'xmlns:tts="http://www.w3.org/ns/ttml#styling" '
          'xmlns:ttp="http://www.w3.org/ns/ttml#parameter" '
          'xmlns:ebuttm="urn:ebu:tt:metadata" '
          'xmlns:ebutts="urn:ebu:tt:style"')


def ebu_doc(attrs: str, head: str, body: str) -> str:
    return (f"{XML}{EBU_TT} {attrs}>\n  <head>\n{head}  </head>\n"
            f"  <body>\n{body}  </body>\n</tt>\n")


DOCS["EbuTtD"] = {
    # EBU-TT-D: cell-based styling with explicit cellResolution
    "EbuTtD001": ebu_doc(
        'ttp:cellResolution="32 15" ttp:timeBase="media"',
        styling('      <style xml:id="s0" tts:fontSize="1c" '
                'tts:color="white" tts:backgroundColor="black"/>\n') +
        layout(region("bottom", origin="10% 80%", extent="80% 13%")),
        p('EBU cell sized', extra='region="bottom" style="s0"')),
    # the IRT samples' two-row bottom-region pattern
    "EbuTtD002": ebu_doc(
        'ttp:cellResolution="50 30" ttp:timeBase="media"',
        layout(region("bottom", origin="10% 70%", extent="80% 26%")),
        p('row one<br/>row two', begin="00:00:00.000",
          end="00:00:02.000", extra='region="bottom"')),
    # clock-format times with fractional seconds (EBU-TT-D style)
    "EbuTtD003": ebu_doc(
        'ttp:timeBase="media"',
        layout(region("r1")),
        p('precise clock', begin="00:00:00.480", end="00:00:02.120",
          extra='region="r1"')),
    # percentage line height on multi-line content
    "EbuTtD004": ebu_doc(
        'ttp:cellResolution="40 24"',
        layout(region("r1", origin="5% 5%", extent="90% 90%")),
        p('<span tts:lineHeight="120%">a</span><br/>b',
          extra='region="r1"')),
    # default cell resolution (40x24 per EBU-TT-D when absent? TTML1
    # default 32x15 applies) — exercise the default path
    "EbuTtD005": ebu_doc(
        'ttp:timeBase="media"',
        layout(region("r1")),
        p('<span tts:fontSize="1c">default cells</span>',
          extra='region="r1"')),
    # ebutts:linePadding is an EBU extension neither the reference nor
    # flutpu consumes — the doc must parse/render with it ignored
    "EbuTtD006": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        styling('      <style xml:id="s0" tts:color="white" '
                'tts:backgroundColor="black" '
                'ebutts:linePadding="0.5c"/>\n') +
        layout(region("bottom", origin="10% 80%", extent="80% 15%")),
        p('line padded', extra='region="bottom" style="s0"')),
    # ebutts:multiRowAlign (tolerated extension) with centered text
    "EbuTtD007": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        styling('      <style xml:id="s0" tts:textAlign="center" '
                'ebutts:multiRowAlign="start"/>\n') +
        layout(region("bottom", origin="10% 70%", extent="80% 25%")),
        p('longer first row<br/>short', extra='region="bottom" '
          'style="s0"')),
    # the IRT two-region top/bottom pattern with simultaneous cues
    "EbuTtD008": ebu_doc(
        'ttp:cellResolution="50 30" ttp:timeBase="media"',
        layout(region("top", origin="10% 5%", extent="80% 15%") +
               region("bottom", origin="10% 80%", extent="80% 15%")),
        ('    <div>\n'
         '      <p begin="00:00:00.000" end="00:00:02.000" '
         'region="top">translation</p>\n'
         '      <p begin="00:00:00.000" end="00:00:02.000" '
         'region="bottom">dialogue</p>\n'
         '    </div>\n')),
    # typical IRT styling bundle: sansSerif family, 160% fontSize,
    # 125% lineHeight, outlined white on transparent
    "EbuTtD009": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        styling('      <style xml:id="s0" tts:fontFamily="sansSerif" '
                'tts:fontSize="160%" tts:lineHeight="125%" '
                'tts:color="white" tts:textOutline="black 1px"/>\n') +
        layout(region("bottom", origin="5% 75%", extent="90% 20%")),
        p('styled bundle<br/>second row',
          extra='region="bottom" style="s0"')),
    # ---- round-5 rebalance (verdict r4 #6): linePadding variants,
    # multiRowAlign x textAlign, and cell-resolution interactions.
    # linePadding in whole cells on the STYLE (vs EbuTtD006's 0.5c)
    "EbuTtD010": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        styling('      <style xml:id="s0" tts:color="white" '
                'tts:backgroundColor="black" ebutts:linePadding="1c"/>\n') +
        layout(region("bottom", origin="10% 80%", extent="80% 15%")),
        p('whole-cell pad', extra='region="bottom" style="s0"')),
    # linePadding directly on the region (not via style)
    "EbuTtD011": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        layout(region("bottom", origin="10% 80%", extent="80% 15%",
                      extra='ebutts:linePadding="0.5c" '
                            'tts:backgroundColor="black"')),
        p('region pad', extra='region="bottom"')),
    # linePadding on the p element itself
    "EbuTtD012": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        layout(region("bottom", origin="10% 80%", extent="80% 15%")),
        p('inline pad', extra='region="bottom" '
          'ebutts:linePadding="0.5c" tts:backgroundColor="black"')),
    # multiRowAlign=center under textAlign=start
    "EbuTtD013": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        styling('      <style xml:id="s0" tts:textAlign="start" '
                'ebutts:multiRowAlign="center"/>\n') +
        layout(region("bottom", origin="10% 70%", extent="80% 25%")),
        p('a very long first row<br/>short',
          extra='region="bottom" style="s0"')),
    # multiRowAlign=end under textAlign=center
    "EbuTtD014": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        styling('      <style xml:id="s0" tts:textAlign="center" '
                'ebutts:multiRowAlign="end"/>\n') +
        layout(region("bottom", origin="10% 70%", extent="80% 25%")),
        p('a very long first row<br/>tail',
          extra='region="bottom" style="s0"')),
    # multiRowAlign=auto (explicit) must follow textAlign
    "EbuTtD015": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        styling('      <style xml:id="s0" tts:textAlign="end" '
                'ebutts:multiRowAlign="auto"/>\n') +
        layout(region("bottom", origin="10% 70%", extent="80% 25%")),
        p('first row of text<br/>row two',
          extra='region="bottom" style="s0"')),
    # cell fontSize at a COARSE cell resolution (10x10: 1c is huge)
    "EbuTtD016": ebu_doc(
        'ttp:cellResolution="10 10" ttp:timeBase="media"',
        layout(region("r1", origin="5% 5%", extent="90% 90%")),
        p('<span tts:fontSize="1c">coarse cells</span>',
          extra='region="r1"')),
    # cell fontSize at a FINE cell resolution (80x48: 1c is small)
    "EbuTtD017": ebu_doc(
        'ttp:cellResolution="80 48" ttp:timeBase="media"',
        layout(region("r1", origin="5% 5%", extent="90% 90%")),
        p('<span tts:fontSize="2c">fine cells</span>',
          extra='region="r1"')),
    # fractional cell fontSize
    "EbuTtD018": ebu_doc(
        'ttp:cellResolution="32 15" ttp:timeBase="media"',
        layout(region("r1", origin="5% 60%", extent="90% 35%")),
        p('<span tts:fontSize="1.5c">one and a half</span>',
          extra='region="r1"')),
    # anamorphic two-length cell fontSize (width c != height c)
    "EbuTtD019": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        layout(region("r1", origin="5% 60%", extent="90% 35%")),
        p('<span tts:fontSize="0.5c 1c">anamorphic cells</span>',
          extra='region="r1"')),
    # lineHeight in cell units interacting with cell fontSize
    "EbuTtD020": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        styling('      <style xml:id="s0" tts:fontSize="1c" '
                'tts:lineHeight="2c"/>\n') +
        layout(region("r1", origin="5% 40%", extent="90% 55%")),
        p('double-spaced<br/>cell rows', extra='region="r1" style="s0"')),
    # region extent/origin in cell units (EBU-TT-D allows c lengths)
    "EbuTtD021": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        layout(region("r1", origin="4c 18c", extent="32c 5c",
                      extra='tts:backgroundColor="black"')),
        p('cell-placed region', extra='region="r1"')),
    # percent fontSize against the DEFAULT cell resolution (32x15)
    "EbuTtD022": ebu_doc(
        'ttp:timeBase="media"',
        layout(region("r1", origin="5% 70%", extent="90% 25%")),
        p('<span tts:fontSize="200%">double default cell</span>',
          extra='region="r1"')),
    # fillLineGap (tolerated EBU extension) with row backgrounds
    "EbuTtD023": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        styling('      <style xml:id="s0" tts:backgroundColor="black" '
                'tts:color="white" ebutts:fillLineGap="true"/>\n') +
        layout(region("bottom", origin="10% 70%", extent="80% 25%")),
        p('gap filled<br/>rows', extra='region="bottom" style="s0"')),
    # ebuttm document metadata block must parse and not affect output
    "EbuTtD024": ebu_doc(
        'ttp:cellResolution="40 24" ttp:timeBase="media"',
        ('    <metadata>\n'
         '      <ebuttm:documentMetadata>\n'
         '        <ebuttm:conformsToStandard>urn:ebu:tt:distribution:2014'
         '-01</ebuttm:conformsToStandard>\n'
         '      </ebuttm:documentMetadata>\n'
         '    </metadata>\n') +
        layout(region("bottom", origin="10% 80%", extent="80% 15%")),
        p('metadata tolerated', extra='region="bottom"')),
    # the full IRT distribution bundle: cell sizing + linePadding +
    # multiRowAlign + two rows + background, at 50x30 cells
    "EbuTtD025": ebu_doc(
        'ttp:cellResolution="50 30" ttp:timeBase="media"',
        styling('      <style xml:id="s0" tts:fontFamily="sansSerif" '
                'tts:fontSize="2c" tts:lineHeight="120%" '
                'tts:color="white" tts:backgroundColor="black" '
                'tts:textAlign="center" ebutts:linePadding="0.5c" '
                'ebutts:multiRowAlign="start"/>\n') +
        layout(region("bottom", origin="10% 76%", extent="80% 20%")),
        p('distribution bundle first row<br/>and the second',
          begin="00:00:00.000", end="00:00:02.000",
          extra='region="bottom" style="s0"')),
}


def main() -> int:
    n = 0
    for area, docs in DOCS.items():
        d = os.path.join(HERE, area)
        os.makedirs(d, exist_ok=True)
        for name, xml in docs.items():
            with open(os.path.join(d, name + ".xml"), "w") as f:
                f.write(xml)
            n += 1
    print(f"wrote {n} corpus documents in {len(DOCS)} areas")
    return n


if __name__ == "__main__":
    main()
