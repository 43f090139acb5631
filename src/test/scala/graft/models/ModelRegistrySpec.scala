package graft.models

import org.scalatest.funsuite.AnyFunSuite

/** Model registry resolution + routing — the reference's
  * `model_manager.get_canonical_model` contract (exact → alias → partial →
  * error) and `llm.py` provider derivation/routing.
  */
class ModelRegistrySpec extends AnyFunSuite {
  import ModelRegistry._

  test("exact canonical id resolves to itself") {
    assert(resolve("text-embedding-3-small").model == "text-embedding-3-small")
    assert(resolve("claude-sonnet-4-6").model == "claude-sonnet-4-6")
  }

  test("alias resolves to canonical id") {
    assert(resolve("sonnet").model == "claude-sonnet-4-6")
    assert(resolve("embed-large").model == "text-embedding-3-large")
    assert(resolve("grok").model == "grok-2")
  }

  test("partial match falls back after exact and alias (id and alias substrings)") {
    // substring of a canonical id
    assert(resolve("embedding-ada").model == "text-embedding-ada-002")
    // substring of an alias only
    assert(resolve("extract").model == "extractive-v1")
    // exact beats partial: "gpt-4o" is a substring of gpt-4o-mini too,
    // but resolves to its own exact entry
    assert(resolve("gpt-4o").model == "gpt-4o")
  }

  test("unknown and empty names error clearly") {
    val e = intercept[NoSuchElementException](resolve("no-such-model-xyz"))
    assert(e.getMessage.contains("no-such-model-xyz"))
    intercept[IllegalArgumentException](resolve("   "))
  }

  test("provider derivation mirrors llm.py (explicit field, then parent/family)") {
    assert(provider(resolve("gpt-4o")) == "openai")
    assert(provider(resolve("sonnet")) == "anthropic")
    assert(provider(resolve("flash")) == "google")
    assert(provider(resolve("grok")) == "xai")
    assert(provider(resolve("llama3.1")) == "ollama")
  }

  test("routing strings: google/xai/ollama prefixed, openai/anthropic bare") {
    assert(routed("flash") == "gemini/gemini-2.0-flash")
    assert(routed("grok") == "xai/grok-2")
    assert(routed("llama3.1") == "ollama/llama3.1")
    assert(routed("sonnet") == "claude-sonnet-4-6")
    assert(routed("gpt-4o-mini") == "gpt-4o-mini")
  }

  test("embedderFor: deterministic family direct, registry names canonical, chat models rejected") {
    assert(embedderFor("deterministic-64", 64).dims == 64)
    assert(embedderFor("deterministic-16", 16).dims == 16)
    val p = embedderFor("embed-small", 8)
    assert(p.model == "text-embedding-3-small")
    assert(p.dims == 1536, "registry dims win when the entry declares them")
    intercept[IllegalArgumentException](embedderFor("sonnet", 64))
    intercept[NoSuchElementException](embedderFor("no-such", 64))
  }

  test("AnswerGen provider routing consumes the registry") {
    import graft.query.AnswerGen
    assert(AnswerGen.providerFor("none")._1 == "none")
    assert(AnswerGen.providerFor("sonnet")._1 == "claude-sonnet-4-6")
    assert(AnswerGen.providerFor("flash")._1 == "gemini/gemini-2.0-flash")
    intercept[NoSuchElementException](AnswerGen.providerFor("no-such"))
  }
}
