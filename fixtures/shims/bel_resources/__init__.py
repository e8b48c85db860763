"""Functional stand-in for the public ``bel_resources`` package, used only at
fixture-build time to run the reference compiler. Implemented from the BEL
script / .belns file formats (see
/root/reference/src/pybel/testing/resources/belns/test_ns_1.belns), not copied.
NOT part of the shipped engine.
"""
import os
import re

from .constants import METADATA_LINE_RE


class ResourceError(Exception):
    def __init__(self, location):
        super().__init__(location)
        self.location = location


class MissingResourceError(ResourceError):
    pass


def sanitize_lines(lines):
    """Strip comments/blank lines and merge backslash-continuations.

    Yields (1-based line_number_of_first_physical_line, merged_line).
    """
    out = []
    it = iter(enumerate(lines, start=1))
    for number, line in it:
        line = line.strip()
        if not line or line.startswith('#'):
            continue
        # merge continuation lines ending with a single backslash
        while line.endswith('\\'):
            line = line[:-1].strip()
            try:
                _, nxt = next(it)
            except StopIteration:
                break
            line = line + ' ' + nxt.strip()
        # strip trailing comments introduced by //
        comment_idx = _find_trailing_comment(line)
        if comment_idx is not None:
            line = line[:comment_idx].strip()
        if line:
            out.append((number, line))
    return out


def _find_trailing_comment(line):
    """Find a ``//`` comment start outside of quotes; return index or None."""
    in_quote = False
    i = 0
    while i < len(line) - 1:
        c = line[i]
        if c == '"':
            in_quote = not in_quote
        elif not in_quote and c == '/' and line[i + 1] == '/':
            return i
        i += 1
    return None


def split_file_to_annotations_and_definitions(lines):
    """Split a BEL script's lines into (documents, definitions, statements)
    sections, each a list of (line_number, line)."""
    sanitized = sanitize_lines(lines)
    documents, definitions, statements = [], [], []
    for number, line in sanitized:
        m = METADATA_LINE_RE.match(line)
        if m is None:
            statements.append((number, line))
        elif line.upper().startswith('SET DOCUMENT'):
            documents.append((number, line))
        else:
            definitions.append((number, line))
    return documents, definitions, statements


def parse_bel_resource(lines):
    """Parse an INI-style .belns/.belanno file into {section: mapping}.

    ``[Values]`` lines are ``name<delimiter>encoding`` (delimiter from
    ``[Processing] DelimiterString``, default ``|``); all other sections are
    ``Key=Value``.
    """
    result = {}
    section = None
    values = []
    for raw in lines:
        line = raw.rstrip('\r\n')
        if not line.strip() or line.strip().startswith('#'):
            continue
        m = re.match(r'^\[(.+)\]\s*$', line.strip())
        if m:
            section = m.group(1)
            if section != 'Values':
                result.setdefault(section, {})
            continue
        if section is None:
            continue
        if section == 'Values':
            values.append(line)
        else:
            if '=' in line:
                k, v = line.split('=', 1)
                result[section][k.strip()] = v.strip()

    delimiter = result.get('Processing', {}).get('DelimiterString', '|')
    value_map = {}
    for line in values:
        if delimiter in line:
            name, encoding = line.rsplit(delimiter, 1)
        else:
            name, encoding = line, ''
        name = name.strip()
        if name:
            value_map[name] = encoding.strip()
    result['Values'] = value_map
    return result


def get_bel_resource(location):
    """Read a .belns/.belanno from a local path or file:// URL."""
    path = location
    if path.startswith('file://'):
        path = path[len('file://'):]
    if not os.path.exists(path):
        raise MissingResourceError(location)
    with open(path, encoding='utf-8') as f:
        return parse_bel_resource(f)


def make_knowledge_header(
    name,
    version=None,
    description=None,
    authors=None,
    contact=None,
    copyright=None,
    licenses=None,
    disclaimer=None,
    namespace_url=None,
    namespace_patterns=None,
    annotation_url=None,
    annotation_patterns=None,
    annotation_list=None,
):
    """Emit the SET DOCUMENT / DEFINE lines of a BEL script header."""
    yield '# Document generated at fixture-build time'
    yield 'SET DOCUMENT Name = "{}"'.format(name)
    yield 'SET DOCUMENT Version = "{}"'.format(version or '1.0.0')
    if description:
        yield 'SET DOCUMENT Description = "{}"'.format(description.replace('\n', ' '))
    if authors:
        yield 'SET DOCUMENT Authors = "{}"'.format(authors)
    if contact:
        yield 'SET DOCUMENT ContactInfo = "{}"'.format(contact)
    if copyright:
        yield 'SET DOCUMENT Copyright = "{}"'.format(copyright)
    if licenses:
        yield 'SET DOCUMENT Licenses = "{}"'.format(licenses)
    if disclaimer:
        yield 'SET DOCUMENT Disclaimer = "{}"'.format(disclaimer)
    for kw, url in sorted((namespace_url or {}).items()):
        yield 'DEFINE NAMESPACE {} AS URL "{}"'.format(kw, url)
    for kw, pattern in sorted((namespace_patterns or {}).items()):
        yield 'DEFINE NAMESPACE {} AS PATTERN "{}"'.format(kw, pattern)
    for kw, url in sorted((annotation_url or {}).items()):
        yield 'DEFINE ANNOTATION {} AS URL "{}"'.format(kw, url)
    for kw, pattern in sorted((annotation_patterns or {}).items()):
        yield 'DEFINE ANNOTATION {} AS PATTERN "{}"'.format(kw, pattern)
    for kw, values in sorted((annotation_list or {}).items()):
        yield 'DEFINE ANNOTATION {} AS LIST {{{}}}'.format(
            kw, ', '.join('"{}"'.format(v) for v in sorted(values)),
        )
