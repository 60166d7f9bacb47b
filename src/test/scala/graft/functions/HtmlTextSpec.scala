package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Pins the two markup-strip tiers against each other: the structural
  * tokenizer ([[HtmlTextKernel]]) must AGREE with the regex tier on
  * well-formed prose, and must be PROVABLY BETTER on the documented
  * divergence goldens — inputs where the regex tier is wrong by
  * construction (quoted `>`, `<pre>` whitespace, partial tags at EOF,
  * numeric entities). */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  private def structural(text: String, attrText: Boolean = false): String =
    Seq(text).toDF("t")
      .select(TextAnalysis.htmlText(col("t"), attrText).as("x"))
      .as[String].head()

  private def regex(text: String): String =
    Seq(text).toDF("t")
      .select(TextAnalysis.stripMarkup(col("t")).as("x"))
      .as[String].head()

  test("agreement: both tiers extract identical text from well-formed markup") {
    val samples = Seq(
      "<p>Hi <b>there</b>, friend.</p>",
      "<html><body><h1>Title</h1><p>Para one.</p><p>Para two.</p></body></html>",
      "<div><script>var x = 1 < 2;</script>visible</div>",
      "<style type=\"text/css\">p { color: red }</style>styled prose",
      "a &lt;tag&gt; &amp; more &nbsp; here",
      "&amp;lt; stays escaped once",
      "<!-- a comment with <div> inside -->after",
      "<!DOCTYPE html><p>doc</p>",
      "<?xml version=\"1.0\"?>pi dropped",
      "no markup at all",
      "math: 1 < 2 and 3 > 2",
      "<b><i>malformed nesting</b></i> survives",
      "<SCRIPT>upper()</SCRIPT>case <B>bold</B>",
      "<script>document.write(1)</script between>leaks?</script>after",
      "")
    samples.foreach { t =>
      assert(structural(t) == regex(t), s"tiers diverge on well-formed input: $t")
    }
  }

  test("golden: quoted '>' in an attribute — regex truncates, tokenizer does not") {
    val in = """<div title="a>b">x</div>"""
    assert(structural(in) == "x")
    assert(structural(in, attrText = true) == "a>b x")
    val r = regex(in)
    assert(r != "x" && r.contains("\">x"), // the regex tier's documented failure
      s"regex tier unexpectedly handled a quoted '>': $r")
  }

  test("golden: <pre> whitespace is content to the tokenizer, collapsed by regex") {
    val in = "<p>intro</p><pre>line1\n  indented</pre><p>outro</p>"
    assert(structural(in) == "intro line1\n  indented outro")
    assert(regex(in) == "intro line1 indented outro")
  }

  test("golden: partial tag at EOF is dropped, not leaked") {
    val in = """hello <div class="x"""
    assert(structural(in) == "hello")
    assert(regex(in).contains("<div"), "regex tier leaks the partial tag")
  }

  test("golden: numeric character references decode in the tokenizer only") {
    assert(structural("A&#66;&#x43; &#120;") == "ABC x")
    assert(regex("A&#66;") == "A&#66;")
    // invalid references stay literal
    assert(structural("&#;&#xZZ;&#1114112; ok") == "&#;&#xZZ;&#1114112; ok")
  }

  test("alt/title attribute text is extracted when asked, silent otherwise") {
    val in = """<img src="fox.png" alt="A red fox"><p>caption</p>"""
    assert(structural(in) == "caption")
    assert(structural(in, attrText = true) == "A red fox caption")
    // entity decoding applies inside attribute values too
    assert(structural("""<a title="Tom &amp; Jerry">x</a>""", attrText = true) ==
      "Tom & Jerry x")
  }

  test("rawtext closer with attributes still closes; unterminated rawtext dies at EOF") {
    assert(structural("<script>x</script foo=\"bar\">after") == "after")
    assert(structural("before<script>never closed") == "before")
    // a '</scriptx>' lookalike does NOT close the element
    assert(structural("a<script>b</scriptx>c</script>d") == "a d")
  }

  test("degenerate empty comments <!--> and <!---> close immediately (HTML5)") {
    // the closer OVERLAPS the opening dashes; a naive search past the
    // opener swallows the whole rest of the document
    assert(structural("intro<!-->rest of the article") == "intro rest of the article")
    assert(structural("a<!--->b") == "a b")
    assert(structural("a<!-- real comment -->b") == "a b")
    assert(structural("a<!-- never closed") == "a")
  }

  test("self-closing syntax on script/style/pre is ignored (HTML5 non-void semantics)") {
    // <script/> OPENS a script: everything to the real closer is payload
    assert(structural("<script src=\"x\"/>var tracker = 1 < 2;</script>after") == "after")
    assert(structural("<style/>.cls { color: red }</style>text") == "text")
    // <pre/> opens a pre: inner whitespace is content until </pre>
    assert(structural("<pre/>a  b</pre>") == "a  b")
  }

}
