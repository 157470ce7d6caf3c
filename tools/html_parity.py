#!/usr/bin/env python3
"""E6 HTML parity battery generator.

Runs a deterministic corpus of messy-HTML shapes through the reference's
extraction loop (etl_pipeline.py:141-148):

    soup = BeautifulSoup(text, 'html.parser')
    for tag in soup.find_all(True):
        t = tag.get_text(strip=True)
        if t and len(t) > 3: row = {tag.name, t, {attr: str(val)}}

with bs4 emulated by tools/bs4_shim.py — the shim delegates ALL
tokenization (tolerant tag parsing, entity conversion via html.unescape,
script/style CDATA, comments/doctype/PI/marked-section boundaries) to the
GENUINE stdlib html.parser that real bs4's 'html.parser' backend wraps;
only the documented bs4 tree-building layer (stack pops, empty elements,
string containers, endData merging, cdata-list attributes) is emulated.

Writes src/test/resources/goldens/html_parity.json:
  {"n": N, "shapes": [{"input": s, "rows": [[tag, text, [[k, v], ...]], ...]}
                      | {"input": s, "raises": true}, ...]}

Shapes that make the stdlib parser raise (malformed marked sections) are
flagged `raises` — the reference would crash on them (no try around the
soup call); the engine's sane mode skips the HTML extractor instead.

Replayed by HtmlParitySpec against graft.etl.Html.tagRows.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bs4_shim import BeautifulSoup  # noqa: E402


def rows_for(text):
    soup = BeautifulSoup(text, 'html.parser')
    out = []
    for tag in soup.find_all(True):
        t = tag.get_text(strip=True)
        if t and len(t) > 3:
            out.append([tag.name, t,
                        [[k, str(v)] for k, v in tag.attrs.items()]])
    return out


def shapes():
    S = []

    # --- plain structure / nesting / text-length boundary ---
    for txt in ['x', 'ab', 'abc', 'abcd', 'abcde', 'four', ' pad ', 'a b',
                'a  b', ' abc ', 'abc ', '\tabcd\t', 'ab\ncd', 'a bcd']:
        S.append('<p>%s</p>' % txt)
        S.append('<div><p>%s</p></div>' % txt)
        S.append('<div><span><b>%s</b></span></div>' % txt)
    S += [
        '<p>hello world</p>',
        '<div>outer <p>inner text</p> tail</div>',
        '<b>ab</b>cd',                        # sibling text does not count
        '<b>ab<i>cd</i></b>',                 # joined child text crosses >3
        '<b> a </b><b> b </b>',
        '<ul><li>one</li><li>two22</li><li>three</li></ul>',
        '<table><tr><td>cell one</td><td>cell two</td></tr></table>',
        '<table><thead><tr><th>Name</th><th>Qty</th></tr></thead>'
        '<tbody><tr><td>widget</td><td>5000</td></tr></tbody></table>',
        'leading text <p>after text</p> trailing',
        '<p>first</p>between<p>second</p>',
        '<html><head><title>Page Title</title></head>'
        '<body><h1>Header!</h1><p>body text</p></body></html>',
        '<div>' * 12 + 'deeply nested' + '</div>' * 12,
        '<p>no close tag at all',
        'text only, no tags',
        '',
        '   ',
    ]

    # --- implicit closes / misnesting / unmatched closers ---
    S += [
        '<b><i>bold italic</b> still italic?</i>',
        '<div><p>para one<p>para two</div>',
        '</div>orphan closer',
        '<div>text</span>more</div>',
        '<a><b><c><d>deep pop</a>after',
        '<p>one</P>two</p>',
        '<i>a<i>b<i>c</i>d</i>e</i>done',
        '<div>end tag with space</div >',
        '<div>end tag spaced name</ div>',
        '<div>attr on closer</div id="x">',
        '</>',
        'x</>y z w',
        '<p>a</p></p>b',
    ]

    # --- void elements / self-closing ---
    S += [
        '<p>line one<br>line two</p>',
        '<p>img here <img src="pic.png"> tail text</p>',
        '<br>bare void text',
        '<br/>slash void text',
        '<img src=x alt="some alt">after img',
        '<div/>self closed div text',
        '<span/>abc</span>defg',
        '<p><input type="text" value="vvvv">after input</p>',
        '<hr><hr/><p>rule text</p>',
        '</br>closer for void</br>',
        '<img>text directly after void</img>',
        '<link rel="stylesheet" href="a.css">linked',
        '<meta charset="utf-8">meta text',
    ]

    # --- attributes ---
    S += [
        '<a href="http://e.com/x?a=1&b=2">link text</a>',
        "<a href='single quoted'>aaaa</a>",
        '<a href=bare>bbbb</a>',
        '<a href=>cccc</a>',
        '<a href>dddd</a>',
        '<a href="">eeee</a>',
        "<a href=''>ffff</a>",
        '<div id="d1" class="big red">classy</div>',
        '<div class=" lead trail ">padded classes</div>',
        '<div class="">empty class</div>',
        '<div class="one">single class</div>',
        '<div class="a\tb\nc">ws classes</div>',
        '<a rel="nofollow noopener" href="#">rel list</a>',
        '<td headers="h1 h2">cell text</td>',
        '<th headers=" h1">header cell</th>',
        '<link rel="icon shortcut">rel on link</link>',
        '<span rel="not multi here">rel not multi on span</span>',
        '<form accept-charset="utf-8 latin1">form text</form>',
        '<iframe sandbox="allow-scripts">frame text</iframe>',
        '<output for="a b">out text</output>',
        '<div a=1 a=2 a=3>dup last wins</div>',
        '<div A="x" a="y">dup case folded</div>',
        '<div CLASS="UP low">upper class attr</div>',
        '<DIV ID="MiXeD">upper tag</DIV>',
        '<div data-x="1" DATA-Y="2">data attrs</div>',
        '<a b="x" c=\'y\' d=z e>attr mix</a>',
        '<a b = "spaced eq">spaced equals</a>',
        '<a b=="double eq">double equals</a>',
        '<a b="x"c="y">glued attrs</a>',
        '<a b="val>with gt">gt in value</a>',
        '<a b="</a>">closer in value</a>',
        '<a b="x" />self close with attrs',
        '<a b="x"/>self close no space',
        '<a b=c/>bare value slash</a> tail',
        '<a b=c/d>slash inside bare</a>',
        '<a accesskey="k1 k2">access keys</a>',
        '<a dropzone="copy move">dropzone</a>',
        '<a style="color: red; font-size: 12px">styled</a>',
        '<a onclick="f(1, \'two\')">handler</a>',
        '<a title="a &amp; b">entity in attr</a>',
        '<a title="&lt;tag&gt;">tagish attr</a>',
        '<a title="&unknown;">unknown entity attr</a>',
        '<a title="&#65;&#x42;">numeric attr</a>',
        '<a class="a &amp; b">entity in multi attr</a>',
        '<a -weird="v">dash lead attr</a>',
        '<a 1num=v>digit lead attr</a>',
        '<a :colon="v" x:y="z">colon attrs</a>',
    ]

    # --- entities in text (resolved by genuine html.unescape) ---
    S += [
        '<p>a &amp; b</p>',
        '<p>a &amp b</p>',
        '<p>&lt;p&gt; is a tag</p>',
        '<p>caf&eacute; time</p>',
        '<p>caf&eacute time</p>',
        '<p>&copy; 2024 Corp</p>',
        '<p>&copy 2024 Corp</p>',
        '<p>&notit; is parsed</p>',
        '<p>&notin; is kept</p>',
        '<p>&unknownref; stays</p>',
        '<p>&UnKnOwN; case</p>',
        '<p>&#65;&#66;&#67; letters</p>',
        '<p>&#x41;&#X42; hex</p>',
        '<p>&#65 no semi</p>',
        '<p>&#151; c1 remap</p>',
        '<p>&#0; nul</p>',
        '<p>&#1114112; too big</p>',
        '<p>&#xD800; surrogate</p>',
        '<p>&#11; invalid cp</p>',
        '<p>&#2; removed</p>',
        '<p>five&nbsp;words here</p>',
        '<p>&nbsp;&nbsp;padded&nbsp;&nbsp;</p>',
        '<p>&NBSP; named case</p>',
        '<p>x &;&; y</p>',
        '<p>& lone amp</p>',
        '<p>&& double</p>',
        '<p>tail amp &</p>',
        '<p>tail ref &amp</p>',
        '<p>tail part &am</p>',
        '<p>&frac12; cup</p>',
        '<p>&fjlig; two cp</p>',
        '<p>a&ampb;c dddd</p>',
        '<p>&amp;amp; double escape</p>',
        '<p>&#97;&#98;&#99;&#100;</p>',
        '<p>mixed &amp; &#38; &AMP; all</p>',
        '<p>&gt&lt chain</p>',
        '<p>money &dollar;5 now</p>',
        '<p>&CounterClockwiseContourIntegral; long name</p>',
    ]

    # --- script / style / template / CDATA containers ---
    S += [
        '<script>var x = 1 < 2 && "</div>";</script>visible after',
        '<script>if (a<b) f();</script>tail',
        '<style>.c { color: red; }</style>styled text',
        '<script>hidden</script><p>shown text</p>',
        '<p>before</p><script>mid hidden</script><p>after txt</p>',
        '<script src="x.js"></script>empty script',
        '<script>unclosed at eof',
        '<style>unclosed style',
        '<script>a</SCRIPT>b c d e',
        '<script>a</script >after spaced close',
        '<script>a</ script>not a close</script>real tail',
        '<script>x</scripty></script>tail2',
        '<script><!-- legacy hide --></script>legacy',
        '<script>&amp; raw not converted</script>rawness',
        '<template><div>in template</div></template>outside text',
        '<template>plain tpl text</template>visible tail',
        '<textarea>not a container</textarea>',
        '<SCRIPT>upper case cdata</SCRIPT>upper tail',
        '<style>a</style<style>b</style>tricky close',
        '<script>document.write("<p>gen</p>");</script>written',
    ]

    # --- comments / doctype / PI / marked sections ---
    S += [
        '<!-- comment --><p>after comment</p>',
        '<p>a<!-- mid -->b cd</p>',
        '<!---->empty comment text',
        '<!-- unclosed comment <p>swallowed?</p>',
        '<!-- nested <b>tag</b> inside -->outside',
        '<!-- double -- dash -->after dashes',
        '<!-- close with space -- >after spaced close',
        '<!DOCTYPE html><p>doc text</p>',
        '<!doctype html><p>lower doctype</p>',
        '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN">dtd text',
        '<!DOCTYPE unclosed',
        '<?php echo "x"; ?>php tail',
        '<?xml version="1.0"?>xml tail',
        '<?>empty pi text',
        '<? unclosed pi',
        '<![CDATA[raw <b>stuff</b>]]>cdata tail',
        '<![CDATA[unclosed cdata',
        '<![if !IE]>cond<![endif]>msie tail',
        '<!bogus decl>bogus tail',
        '<!x>tiny decl tail',
        '<!>empty bang text',
        '<p>a<!DOCTYPE mid>b cde</p>',
    ]

    # --- malformed / tolerant tokenization ---
    S += [
        '<p>1 < 2 but 3 > 2</p>',
        'a < b text',
        'x<1tag>y zzz',
        '<=a> math text',
        '< p>space before name</p>',
        '<p >space after name ok</p>',
        '<a b="unclosed quote>rest</a>',
        "<a b='unclosed single>rest2</a>",
        '<a b=c">stray quote</a>',
        '<a "standalone">quoted name</a>',
        '<a b c d>bare attrs</a>',
        '<a/b>slash in name</a>',
        '<a <b>>nested open</a>',
        '<div',
        '<div ',
        '<div attr',
        '<div attr=',
        '<div attr="v"',
        'text before <div',
        '<a href="x">unclosed pair',
        '<<double open>> text',
        '<a>>extra gt</a>',
        '<>empty tag text',
        '</ >spaced closer',
        '<p>lone < mid text</p>',
        '<p>tail lt <</p>',
        'end with lt <',
        'end with open <p',
        'end with amp &',
        'end with ref &amp',
        '\x00nul lead<p>nul text</p>',
        '<p\x00>nul in tag</p>',
        '<p>a\x00b cd</p>',
    ]

    # --- malformed marked sections: stdlib RAISES, reference would crash ---
    S += [
        '<![foo]>x yz',
        '<![123]]>y zw',
        '<![ spaced]>text here',
        '<p>pre</p><![weird]]>post text',
    ]

    # --- unicode / whitespace edges ---
    S += [
        '<p>  nbsp pad </p>',
        '<p> line sep </p>',
        '<p>\x85nel edge\x85</p>',
        '<p>　ideographic　</p>',
        '<p>héllo wörld</p>',
        '<p>日本語テキスト</p>',
        '<p>emoji 😀 text</p>',
        '<p dir="rtl">نص عربي</p>',
        '<Straße attr="ü">unicode tagname?</Straße>',
    ]

    # --- reference-fixture-like documents ---
    S += [
        'Report for Q3.\n<table>\n  <tr><th>Region</th><th>Sales</th></tr>\n'
        '  <tr><td>EMEA</td><td>1,200</td></tr>\n'
        '  <tr><td>APAC</td><td>2,400</td></tr>\n</table>\nEnd of report.',
        '<html>\n<head><script>var cfg = {"a": [1,2]};</script></head>\n'
        '<body>\n<div class="header main">Site Header</div>\n'
        '<!-- nav -->\n<ul class="nav">\n<li><a href="/a">Alpha</a></li>\n'
        '<li><a href="/b">Beta!</a></li>\n</ul>\n'
        '<p>Welcome &amp; enjoy&nbsp;your stay.</p>\n</body>\n</html>',
        'prefix {"k": "v"} <div>html after json</div> [1,2,3] suffix',
    ]

    # --- combinatorial: tag × attr × content ---
    tags = ['div', 'span', 'td', 'a', 'section']
    attrs = ['', ' class="x y"', ' id=plain', " title='q v'",
             ' class="x y" id="z"', ' rel="a b"']
    contents = ['abcd', 'ab', 'text &amp; more', ' sp ', '<b>kid text</b>',
                'pre<b>kid</b>post', '&#77;&#78; nn']
    for t in tags:
        for a in attrs:
            for c in contents:
                S.append('<%s%s>%s</%s>' % (t, a, c, t))

    # --- combinatorial: entity × context ---
    ents = ['&amp;', '&amp', '&eacute;', '&eacute', '&unknown;', '&#65;',
            '&#x41;', '&#65', '&', '&;', '&#;', '&#x;', '&gt;a&lt;']
    for e in ents:
        S.append('<p>l %s r</p>' % e)
        S.append('<p>%sabc</p>' % e)
        S.append('<p>abc%s</p>' % e)
        S.append('<a t="%s">attr ent body</a>' % e)
        S.append('<a class="%s x">attr ent multi</a>' % e)

    # --- deterministic soup fuzz: 600 shapes assembled from a token
    # vocabulary by a seeded LCG — catches interactions the
    # hand-enumerated families miss (tokenizer state machine crossings,
    # entity/tag/comment adjacency, surprise pops) ---
    vocab = [
        '<div>', '</div>', '<p>', '</p>', '<span class="a b">', '</span>',
        '<br>', '<img src=x>', '<b>', '</b>', '<i>', '</i>', '<a href="#">',
        '</a>', '<li>', '</li>', '<table>', '</table>', '<tr>', '</tr>',
        '<td>', '</td>', '<script>', '</script>', '<style>', '</style>',
        '<template>', '</template>', '<!-- c -->', '<!---->', '<!DOCTYPE html>',
        '<?pi?>', '<![CDATA[x]]>', 'word', 'longer words here', 'ab', 'x',
        '1 < 2', '&amp;', '&eacute;', '&unknown;', '&#65;', '&amp', '&',
        '<', '>', '<a b="v>', '</ x>', '<1bad>', '</>', '<div', ' ', '\n',
        '\t', '  ', '<DIV>', '</DIV>', '<a b c>', '<a b="x" b="y">',
        '<input value="q">', '&nbsp;', '<em>deep <u>under</u></em>',
    ]
    seed = 0x2545F4914F6CDD1D
    state = 12345

    def lcg():
        nonlocal state
        state = (state * 6364136223846793005 + seed) % (1 << 64)
        return state >> 33

    for _ in range(600):
        k = 3 + lcg() % 12
        S.append(''.join(vocab[lcg() % len(vocab)] for _ in range(k)))

    # --- combinatorial: broken-tag tails ---
    frags = ['<a', '<a ', '<a b', '<a b=', '<a b="v', "<a b='v", '<a b="v"',
             '<a b=v', '<a /', '<a b="v" /']
    for f in frags:
        S.append('lead text %s' % f)
        S.append('%s> tail text' % f)
        S.append('<p>pre</p>%s' % f)
    return S


def main():
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                            'src', 'test', 'resources', 'goldens',
                            'html_parity.json')
    entries = []
    n_raises = 0
    for s in shapes():
        try:
            entries.append({'input': s, 'rows': rows_for(s)})
        except Exception as e:  # malformed marked sections raise in stdlib
            entries.append({'input': s, 'raises': True, 'err': type(e).__name__})
            n_raises += 1
    with open(out_path, 'w', encoding='utf-8') as f:
        json.dump({'n': len(entries), 'raises': n_raises, 'shapes': entries},
                  f, ensure_ascii=True, indent=None, separators=(',', ':'))
    print('wrote', out_path, len(entries), 'shapes,', n_raises, 'raising')


if __name__ == '__main__':
    main()
