package graft.js

/** AST for the deterministic JavaScript subset executed by [[Interp]].
  *
  * The subset is what the reference's lens isolate actually exercises
  * (reference: library/workers/javascript-lens-worker.js:104 wraps user
  * code as `function map (path, data) { <code> }`; the worker tests at
  * test/test-workers-javascript-lens.js and
  * test/test-workers-javascript-environment.js use for-of, arrow
  * functions, `Array.prototype.reduce`, spread calls, `new Set`,
  * template-free strings and dynamic member access): ES5.1 statements
  * and expressions plus arrow functions, `for-of`, template literals,
  * spread in calls/array literals, shorthand object properties,
  * classes (round 8), private members/static blocks (round 12), and
  * generator functions (`function*`/`yield`/`yield*`, round 13).
  * async/await and `with` are rejected at parse time — matching the
  * reference contract that unsupported syntax surfaces as a startup
  * error, not a runtime one (test-workers-javascript-lens.js:21-30).
  */
object Ast {

  /** 1-based source line, carried for error stacks
    * (reference transformVMError keeps {line, code}). */
  final case class Pos(line: Int)

  sealed trait Node { def pos: Pos }

  // ---- expressions ----
  sealed trait Expr extends Node
  final case class NumLit(v: Double, pos: Pos) extends Expr
  final case class StrLit(v: String, pos: Pos) extends Expr
  final case class BoolLit(v: Boolean, pos: Pos) extends Expr
  final case class NullLit(pos: Pos) extends Expr
  final case class UndefinedLit(pos: Pos) extends Expr
  /** array-literal elision slot — evaluates to an array HOLE */
  final case class HoleLit(pos: Pos) extends Expr
  final case class RegexLit(pattern: String, flags: String, pos: Pos) extends Expr
  /** `cooked` parts interleaved with `exprs`: parts.size == exprs.size + 1 */
  final case class TemplateLit(parts: Vector[String], exprs: Vector[Expr], pos: Pos) extends Expr
  /** Tagged template `tag`a${x}b``: `cooked` is None per chunk when the
    * chunk carries an invalid escape (legal ONLY in tagged position —
    * ES2018; the cooked element is undefined there), `raw` is the
    * source text with escapes intact. */
  final case class TaggedTemplate(tag: Expr, cooked: Vector[Option[String]],
                                  raw: Vector[String], exprs: Vector[Expr],
                                  pos: Pos) extends Expr
  final case class Ident(name: String, pos: Pos) extends Expr
  final case class ThisExpr(pos: Pos) extends Expr
  final case class ArrayLit(items: Vector[Expr], spreads: Set[Int], pos: Pos) extends Expr
  /** key is the literal/computed property name; shorthand `{a}` arrives as (StrLit("a"), Ident("a"));
    * `getters`/`setters` mark entry indices whose value FnExpr is an accessor body */
  final case class ObjectLit(entries: Vector[(Expr, Expr)], computed: Set[Int],
                             spreads: Set[Int], getters: Set[Int],
                             setters: Set[Int], pos: Pos) extends Expr
  final case class FnExpr(name: Option[String], params: Vector[Pattern], restParam: Option[String],
                          body: Vector[Stmt], isArrow: Boolean,
                          /** arrow with expression body: `x => x + 1` */
                          exprBody: Option[Expr], pos: Pos,
                          /** `function*` / `*method()` — calling one returns a
                            * suspended [[JsGenerator]] instead of running the body */
                          isGenerator: Boolean = false,
                          /** `async function` / async arrow / async method —
                            * calling one returns a [[JsPromise]] (r14) */
                          isAsync: Boolean = false) extends Expr
  /** `yield` / `yield*` — legal only inside a generator body (parser-
    * enforced); `delegate` marks `yield*`. */
  final case class Yield(arg: Option[Expr], delegate: Boolean, pos: Pos) extends Expr
  /** `await` — legal only directly inside an async function body
    * (parser-enforced, like [[Yield]] in generators). */
  final case class Await(arg: Expr, pos: Pos) extends Expr
  final case class Unary(op: String, operand: Expr, pos: Pos) extends Expr
  /** prefix/postfix ++/-- */
  final case class Update(op: String, target: Expr, prefix: Boolean, pos: Pos) extends Expr
  final case class Binary(op: String, l: Expr, r: Expr, pos: Pos) extends Expr
  final case class Logical(op: String, l: Expr, r: Expr, pos: Pos) extends Expr
  final case class Cond(test: Expr, cons: Expr, alt: Expr, pos: Pos) extends Expr
  /** op is "=" or a compound like "+=" */
  final case class Assign(op: String, target: Expr, value: Expr, pos: Pos) extends Expr
  final case class Member(obj: Expr, prop: Expr, computed: Boolean, optional: Boolean, pos: Pos) extends Expr
  /** private-name property in member position (`obj.#x`): only ever
    * the `prop` of a non-computed [[Member]]; the name keeps its '#'.
    * Resolution is lexical — the interpreter looks the name up in the
    * class scope chain (innermost declaring class wins). */
  final case class PrivName(name: String, pos: Pos) extends Expr
  // (the ES2022 brand check `#x in e` parses as Binary("in",
  //  PrivName, e) — no dedicated node)
  final case class Call(callee: Expr, args: Vector[Expr], spreads: Set[Int],
                        optional: Boolean, pos: Pos) extends Expr
  final case class NewExpr(callee: Expr, args: Vector[Expr], spreads: Set[Int], pos: Pos) extends Expr
  final case class Sequence(exprs: Vector[Expr], pos: Pos) extends Expr

  // ---- binding patterns (params, declarations) ----
  sealed trait Pattern extends Node
  final case class IdPattern(name: String, pos: Pos) extends Pattern
  final case class ArrayPattern(elems: Vector[Option[Pattern]], rest: Option[String], pos: Pos) extends Pattern
  /** entries: (propertyKey, binding); shorthand `{a}` is
    * (Left("a"), IdPattern("a")); a COMPUTED key `{ [expr]: p }` (r15)
    * is Right(expr) — evaluated at bind time, may be a symbol */
  final case class ObjectPattern(entries: Vector[(Either[String, Expr], Pattern)],
                                 rest: Option[String], pos: Pos) extends Pattern
  /** binding with default value: `(a = 1) =>` or `const {a = 1} = o` */
  final case class DefaultPattern(inner: Pattern, default: Expr, pos: Pos) extends Pattern

  // ---- classes ----
  /** one class member; kind: method | get | set | ctor | field |
    * staticblock. For fields, `fn` is a zero-param function whose
    * exprBody is the initializer (absent → undefined). `name` is a
    * StrLit unless `computed`; for PRIVATE members (`isPrivate`) it is
    * a StrLit carrying the '#'-prefixed name, never computed. */
  final case class MethodDef(name: Expr, fn: FnExpr, isStatic: Boolean,
                             kind: String, computed: Boolean,
                             isPrivate: Boolean = false)
  final case class ClassExpr(name: Option[String], parent: Option[Expr],
                             members: Vector[MethodDef], pos: Pos) extends Expr
  /** `super` — legal only as `super(...)` / `super.x` / `super[x]`
    * inside class bodies (parser-enforced); evalChain resolves it. */
  final case class SuperRef(pos: Pos) extends Expr

  // ---- statements ----
  sealed trait Stmt extends Node
  final case class ExprStmt(e: Expr, pos: Pos) extends Stmt
  final case class ClassDecl(name: String, cls: ClassExpr, pos: Pos) extends Stmt
  /** kind: var | let | const */
  final case class VarDecl(kind: String, decls: Vector[(Pattern, Option[Expr])], pos: Pos) extends Stmt
  final case class FnDecl(name: String, fn: FnExpr, pos: Pos) extends Stmt
  final case class Block(stmts: Vector[Stmt], pos: Pos) extends Stmt
  final case class If(test: Expr, cons: Stmt, alt: Option[Stmt], pos: Pos) extends Stmt
  final case class While(test: Expr, body: Stmt, pos: Pos) extends Stmt
  final case class DoWhile(body: Stmt, test: Expr, pos: Pos) extends Stmt
  final case class For(init: Option[Stmt], test: Option[Expr], update: Option[Expr],
                       body: Stmt, pos: Pos) extends Stmt
  /** isOf=true → for-of, false → for-in; decl kind "" means bare target assignment */
  final case class ForInOf(kind: String, target: Pattern, obj: Expr, isOf: Boolean,
                           /** `for await (… of …)` — legal only directly inside
                             * an async body (r14); always false for for-in */
                           isAwait: Boolean,
                           body: Stmt, pos: Pos) extends Stmt
  final case class Return(value: Option[Expr], pos: Pos) extends Stmt
  final case class Throw(value: Expr, pos: Pos) extends Stmt
  final case class Try(block: Block, catchParam: Option[Pattern], catchBlock: Option[Block],
                       finallyBlock: Option[Block], pos: Pos) extends Stmt
  final case class Break(label: Option[String], pos: Pos) extends Stmt
  final case class Continue(label: Option[String], pos: Pos) extends Stmt
  final case class Labeled(label: String, body: Stmt, pos: Pos) extends Stmt
  final case class Switch(disc: Expr, cases: Vector[(Option[Expr], Vector[Stmt])], pos: Pos) extends Stmt
  final case class Empty(pos: Pos) extends Stmt

  final case class Program(body: Vector[Stmt])
}

/** Syntax error with the 1-based line, reported at lens startup the way
  * the reference reports isolate compile errors
  * (javascript-lens-worker.js:107-110). */
final class JsSyntaxError(msg: String, val line: Int)
  extends RuntimeException(s"$msg (line $line)")
