#!/usr/bin/env python3
"""BeautifulSoup('html.parser') emulation on the stdlib parser, for golden
capture in this offline container (real bs4 is not installed).

Fidelity notes — this reproduces the documented behavior of bs4 >= 4.9 over
its html.parser backend, which wraps exactly the stdlib html.parser.HTMLParser
used here (convert_charrefs=True, so entity conversion, CDATA handling for
script/style, tag/attr lowercasing and tolerant parsing all come from the
SAME code real bs4 runs). The emulated layer on top is the tree builder:

 - find_all(True): every Tag in document order (bs4 .descendants order).
 - end tags pop to the nearest matching open tag, implicitly closing
   descendants (bs4 BeautifulSoup._popToTag); unmatched closers are ignored.
 - empty-element tags (bs4 HTMLTreeBuilder.empty_element_tags) never nest.
 - get_text(strip=True): each string stripped, empties dropped, joined with
   ''. Only plain NavigableStrings count — bs4's exact-type filtering means
   Comments, Doctypes, ProcessingInstructions and the Script / Stylesheet /
   TemplateString classes (strings under script/style/template containers,
   bs4 string_containers) are all EXCLUDED, as in bs4 >= 4.9.
 - multi-valued attributes (bs4 cdata_list_attributes: global
   class/accesskey/dropzone plus per-tag rel/rev/headers/...) become lists
   via re.split(r'\\s+', value) — reproducing bs4's quirk where leading or
   trailing whitespace yields EMPTY list entries; value '' gives [].
 - bare attributes get value '' ; duplicate attributes keep the LAST value
   (bs4 on_duplicate_attribute default 'replace').
"""
import re
from html.parser import HTMLParser

EMPTY_ELEMENT_TAGS = {
    'area', 'base', 'br', 'col', 'embed', 'hr', 'img', 'input', 'keygen',
    'link', 'menuitem', 'meta', 'param', 'source', 'track', 'wbr',
    'basefont', 'bgsound', 'command', 'frame', 'image', 'isindex', 'nextid',
    'spacer',
}
CDATA_LIST_GLOBAL = {'class', 'accesskey', 'dropzone'}
CDATA_LIST_PER_TAG = {
    'a': {'rel', 'rev'}, 'link': {'rel', 'rev'},
    'td': {'headers'}, 'th': {'headers'},
    'form': {'accept-charset'}, 'object': {'archive'},
    'area': {'rel'}, 'icon': {'sizes'},
    'iframe': {'sandbox'}, 'output': {'for'},
}
STRING_CONTAINERS = {'script', 'style', 'template'}
_ws = re.compile(r'\s+')


class Tag:
    def __init__(self, name, attrs):
        self.name = name
        self.attrs = attrs
        self.children = []  # Tag | (kind, str) with kind in {'text', 'hidden'}

    def get_text(self, separator='', strip=False):
        parts = []

        def walk(node):
            for c in node.children:
                if isinstance(c, Tag):
                    walk(c)
                else:
                    kind, s = c
                    if kind != 'text':
                        continue
                    if strip:
                        s = s.strip()
                        if not s:
                            continue
                    parts.append(s)

        walk(self)
        return separator.join(parts)


class _Builder(HTMLParser):
    def __init__(self, soup):
        super().__init__(convert_charrefs=True)
        self.soup = soup
        self.stack = [soup._root]
        self._buf = []

    def _make(self, name, attrs):
        multi = CDATA_LIST_GLOBAL | CDATA_LIST_PER_TAG.get(name, set())
        d = {}
        for k, v in attrs:  # later duplicates overwrite: 'replace' default
            if v is None:
                v = ''
            if k in multi:
                v = [] if v == '' else _ws.split(v)
            d[k] = v
        return Tag(name, d)

    # bs4 BeautifulSoup.endData: adjacent handle_data chunks buffer in
    # current_data and join into ONE NavigableString at the next tag /
    # comment / decl / PI event — "a <3 b" is a single string "a <3 b",
    # not three — so get_text(strip=True) strips the JOINED run once.
    # (`</>` is consumed with no handler call, so it does NOT flush.)
    def _end_data(self):
        if not self._buf:
            return
        data = ''.join(self._buf)
        self._buf = []
        hidden = any(t.name in STRING_CONTAINERS for t in self.stack)
        self.stack[-1].children.append(('hidden' if hidden else 'text', data))

    def handle_starttag(self, name, attrs):
        self._end_data()
        tag = self._make(name, attrs)
        self.stack[-1].children.append(tag)
        self.soup._order.append(tag)
        if name not in EMPTY_ELEMENT_TAGS:
            self.stack.append(tag)

    def handle_startendtag(self, name, attrs):
        self._end_data()
        tag = self._make(name, attrs)
        self.stack[-1].children.append(tag)
        self.soup._order.append(tag)

    def handle_endtag(self, name):
        self._end_data()
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == name:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if not data:
            return
        self._buf.append(data)

    # Comment / Doctype / ProcessingInstruction: excluded from get_text by
    # bs4's exact-type string filtering — represented as non-text children;
    # each flushes the text buffer exactly like bs4's typed-string endData
    def handle_comment(self, data):
        self._end_data()
        self.stack[-1].children.append(('hidden', data))

    def handle_decl(self, decl):
        self._end_data()
        self.stack[-1].children.append(('hidden', decl))

    def handle_pi(self, data):
        self._end_data()
        self.stack[-1].children.append(('hidden', data))

    def unknown_decl(self, data):
        self._end_data()
        self.stack[-1].children.append(('hidden', data))

    def close(self):
        super().close()
        self._end_data()


class BeautifulSoup:
    def __init__(self, text, features='html.parser'):
        self._root = Tag('[document]', {})
        self._order = []
        b = _Builder(self)
        b.feed(text)
        b.close()

    def find_all(self, predicate):
        assert predicate is True, 'shim supports find_all(True) only'
        return list(self._order)
