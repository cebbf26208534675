"""XSLT transformation stage (SURVEY §2.1 T10).

Reference analog: ``Transformer`` — the generate step applies
``res/xsl/generic.xsl`` (or a repo-specific stylesheet) to each parsed
XHTML file plus its annotation file, producing the browser HTML under
``generated/`` ([ref: ferenda/transformer.py :: Transformer.transform,
ferenda/documentrepository.py :: generate]). The reference shells out to
``lxml.etree.XSLT`` per file; here the stylesheet is applied **inside one
``mapInPandas`` pass** over the xhtml table:

- the stylesheet source is a plain string captured in the UDF closure
  (broadcast-sized by construction); each Python worker compiles it ONCE
  (process-level memo keyed on the source hash) and reuses the compiled
  template table for every Arrow batch — compile cost is O(workers), not
  O(rows);
- per-row work is pure CPU with no shared state → embarrassingly parallel,
  zero shuffle, scales linearly with executors at any corpus size;
- per-row parameters (the reference's annotation-file input) arrive as
  string COLUMNS (``param_cols``), not side files — no driver-side I/O,
  no ``document()`` calls;
- malformed XHTML or a stylesheet construct outside the engine's subset
  yields an errors-as-data row (``transform_error`` set, ``html`` NULL)
  instead of failing the stage — same policy as sources/docformats.py.

The engine itself (an XSLT 1.0 subset over ``xml.etree``) lives in
functions/xslt.py; see its docstring for the supported surface.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ferenda_spark.functions.xslt import XsltError, compile_stylesheet, transform

#: Browser-HTML rendering of render_xhtml()'s parsed XHTML+RDFa: the same
#: output slot as the reference's generic.xsl — head/title carried over, a
#: nav with one entry per top-level section, sections → anchored divs,
#: resolved citations stay links, unlinked mentions become <em>.
#: [ref: ferenda/res/xsl/generic.xsl]
GENERIC_XSL = """\
<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform"
    xmlns="http://www.w3.org/1999/xhtml">
  <xsl:param name="annotations"/>
  <xsl:template match="/">
    <html>
      <head>
        <title><xsl:value-of select="html/head/title"/></title>
        <meta charset="utf-8"/>
      </head>
      <body>
        <nav class="toc">
          <ul>
            <xsl:for-each select="html/body/section">
              <li>
                <a href="#{substring-after(@about, '#')}">
                  <xsl:value-of select="*[1]"/>
                </a>
              </li>
            </xsl:for-each>
          </ul>
        </nav>
        <article about="{html/@about}" lang="{html/@lang}">
          <h1><xsl:value-of select="html/head/title"/></h1>
          <xsl:apply-templates select="html/body/section"/>
          <xsl:if test="string-length($annotations) > 0">
            <aside class="annotations"><xsl:value-of select="$annotations"/></aside>
          </xsl:if>
        </article>
      </body>
    </html>
  </xsl:template>
  <xsl:template match="section">
    <div class="section" id="{substring-after(@about, '#')}">
      <xsl:apply-templates/>
    </div>
  </xsl:template>
  <xsl:template match="h2|h3|h4|h5|h6">
    <xsl:copy><xsl:apply-templates/></xsl:copy>
  </xsl:template>
  <xsl:template match="p">
    <p><xsl:apply-templates/></p>
  </xsl:template>
  <xsl:template match="a">
    <a class="ref" href="{@href}"><xsl:apply-templates/></a>
  </xsl:template>
  <xsl:template match="span">
    <em class="mention"><xsl:apply-templates/></em>
  </xsl:template>
</xsl:stylesheet>
"""

# process-level compiled-stylesheet memo: worker processes are reused across
# Arrow batches and tasks, so each executor pays the compile exactly once
# per distinct stylesheet
_COMPILED: dict[str, object] = {}


def _compiled(src: str):
    key = hashlib.sha256(src.encode()).hexdigest()
    hit = _COMPILED.get(key)
    if hit is None:
        hit = _COMPILED[key] = compile_stylesheet(src)
    return hit


def transform_xml(
    df: DataFrame,
    stylesheet: str = GENERIC_XSL,
    input_col: str = "xhtml",
    output_col: str = "html",
    param_cols: dict[str, str] | None = None,
    keep_cols: tuple[str, ...] = ("basefile",),
) -> DataFrame:
    """Apply ``stylesheet`` to every row's ``input_col`` XML string.

    ``param_cols`` maps stylesheet ``xsl:param`` names to column names —
    the per-row replacement for the reference's annotation-file input.
    Output: ``keep_cols`` + ``output_col`` + ``transform_error`` (NULL on
    success; on failure the error message, with ``output_col`` NULL).

    The stylesheet is validated eagerly on the driver (a subset violation
    should fail the job submission, not every task)."""
    compile_stylesheet(stylesheet)  # driver-side eager validation
    params = dict(param_cols or {})
    in_cols = [*keep_cols, input_col, *params.values()]
    out_schema = T.StructType(
        [df.schema[c] for c in keep_cols]
        + [
            T.StructField(output_col, T.StringType()),
            T.StructField("transform_error", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sheet = _compiled(stylesheet)
        for pdf in batches:
            htmls: list[str | None] = []
            errs: list[str | None] = []
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                try:
                    p = {
                        name: ("" if d[col] is None else str(d[col]))
                        for name, col in params.items()
                    }
                    htmls.append(transform(sheet, d[input_col], params=p))
                    errs.append(None)
                except XsltError as e:
                    htmls.append(None)
                    errs.append(str(e))
            out = pdf[list(keep_cols)].copy()
            out[output_col] = pd.Series(htmls, dtype="object")
            out["transform_error"] = pd.Series(errs, dtype="object")
            yield out

    return df.select(*in_cols).mapInPandas(run, schema=out_schema)


def generate_html(docs_xhtml: DataFrame, stylesheet: str = GENERIC_XSL) -> DataFrame:
    """The reference's ``generate`` step: parsed XHTML table → browser HTML
    table (id cols, html, transform_error, n_bytes). Input is
    ``render_xhtml``'s output (url, part_key, xhtml) — part_key is kept so
    the generated layer writes with the SAME partitioning as the parsed
    layer (no shuffle between the two sinks). An optional ``annotations``
    column (J2's CONSTRUCT payload per doc) feeds the stylesheet's
    ``$annotations`` param when present."""
    param_cols = (
        {"annotations": "annotations"}
        if "annotations" in docs_xhtml.columns
        else None
    )
    keep = tuple(
        c for c in ("basefile", "url", "part_key") if c in docs_xhtml.columns
    )
    return transform_xml(
        docs_xhtml,
        stylesheet,
        input_col="xhtml",
        output_col="html",
        param_cols=param_cols,
        keep_cols=keep,
    ).withColumn("n_bytes", F.octet_length("html"))
